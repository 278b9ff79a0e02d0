"""Local mirror of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count +
column names + order-insensitive values.

Usage: python tools/check_oracles.py [name ...]
"""

from __future__ import annotations

import datetime
import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import os as _os

SF_DIR = _os.environ.get("CHECK_ORACLES_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(norm(r[i]) for i in order) for r in rows), key=repr
    )


def main(only: list[str]):
    import json as _json

    json_out = None
    if "--json" in only:
        i = only.index("--json")
        json_out = only[i + 1]
        only = only[:i] + only[i + 2:]
    records: dict[str, dict] = {}

    import __spark_entry__ as entrymod

    # VANILLA session on purpose — the driver's harness builds one with no
    # engine confs (round-1 lesson: the mirror used get_spark() and passed
    # while the driver's session failed on every query). The engine must
    # self-configure via Catalog.ensure_runtime_confs.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = datetime.datetime.now()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            # The driver's pandas canonicalizer cannot sort/hash
            # array/map/struct cells (numpy.ndarray is unhashable) —
            # reject them HERE so the mirror fails exactly where the
            # driver would (r3 lesson: norm() tuple-izing lists masked
            # the datalog_pull gate error for three rounds).
            complex_cols = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if complex_cols:
                failures.append(name)
                records[name] = {"status": "fail",
                                 "err": f"complex-typed cols {complex_cols}"}
                print(
                    f"FAIL {name}: complex-typed result columns "
                    f"{complex_cols} — encode as comma-joined strings on "
                    f"BOTH sides for the driver canonicalizer"
                )
                continue
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            records[name] = {"status": "fail", "err": f"spark: {e}"[:300]}
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            dt = (datetime.datetime.now() - t0).total_seconds()
            records[name] = {"status": "rows_only", "rows": len(srows),
                             "sec": round(dt, 1)}
            print(f"....  {name}: no oracle, rows={len(srows)} ({dt:.1f}s)")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = res.columns
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            records[name] = {"status": "fail", "err": f"duckdb: {e}"[:300]}
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            ok = False
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
        elif len(srows) != len(orows):
            ok = False
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
        else:
            a = normalize_rows(scols, srows)
            b = normalize_rows(ocols, orows)
            if a != b:
                ok = False
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diff}")
        if ok:
            dt = (datetime.datetime.now() - t0).total_seconds()
            records[name] = {"status": "pass", "rows": len(srows),
                             "sec": round(dt, 1)}
            print(f"PASS {name}: rows={len(srows)} ({dt:.1f}s)")
        else:
            failures.append(name)
            records[name] = {"status": "fail"}
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_out:
        n_pass = sum(1 for r in records.values() if r["status"] == "pass")
        with open(json_out, "w") as f:
            _json.dump(
                {
                    "sf_dir": SF_DIR,
                    "gates": len(records),
                    "pass": n_pass,
                    "fail": len(failures),
                    "results": records,
                },
                f,
                indent=1,
            )
        print(f"mirror record -> {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
