"""All-TPC-H scale record: run every tpch_* gate against a data dir and
write TPCH_SF{N}.json (per-query min-of-2 walls, executed-plan
fingerprints, box probe).

The r12 TPCH_SF1 artifact was recorded ad hoc; this makes it a repeatable
tool so gate rewrites (e.g. the r13 q18 semi-join pushdown) refresh the
standing record instead of leaving it stale (round-process rule: standing
scale artifacts are refreshed when the code or config under them moves).

Usage: python tools/tpch_scale.py [data_dir] [sf_label]
  data_dir: default /root/repo/testdata_sf1
  sf_label: default inferred from dir name (sf1/sf10); names the output
            TPCH_SF{label}.json
BASELINE.md context: the reference times its TPC-H suite at sf0.05
(189.9s wall); sf1 = 20x that scale, sf10 = 200x.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    data_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "testdata_sf1"
    )
    label = sys.argv[2] if len(sys.argv) > 2 else (
        "10" if "sf10" in os.path.basename(data_dir.rstrip("/")) else "1"
    )
    bench = _load(os.path.join(REPO, "bench.py"), "bench")
    probe = bench._box_probe()
    import __spark_entry__ as entrymod
    from crux_spark import get_spark

    spark = get_spark("tpch-scale")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(data_dir, "lineitem.parquet")):
        print(f"# building data at {data_dir}", file=sys.stderr)
        make = _load(os.path.join(REPO, "tools", "make_sf1.py"), "make_sf1")
        make.build(spark, data_dir,
                   replicas=100 if label == "10" else 10)

    queries = entrymod.queries()
    gates = sorted(
        (n for n in queries if n.startswith("tpch_q")),
        key=lambda n: (int("".join(c for c in n.split("_")[1] if
                                   c.isdigit())), n),
    )
    timings, plans, rows_out = {}, {}, {}
    total = 0.0
    for name in gates:
        best, df, n = None, None, None
        for _ in range(2):
            sec, df, n = bench._timed_run(queries[name], spark, data_dir)
            best = sec if best is None else min(best, sec)
            bench._cleanup(spark)
        timings[name] = round(best, 2)
        plans[name] = bench._fingerprint(df)
        rows_out[name] = n
        total += best
        print(f"# {name}: {best:.2f}s rows={n}", file=sys.stderr)

    rec = {
        "metric": f"tpch_sf{label}_wall",
        "unit": "sec",
        "sf": float(label),
        "value": round(total, 2),
        "note": (
            "every tpch_* gate (22 queries + the q21 anti variant), "
            "min-of-2 per query, local[32]. Reference suite wall at "
            "sf0.05: 189.9s (BASELINE.md)."
        ),
        "box_probe": probe,
        "queries": timings,
        "rows_out": rows_out,
        "plans": plans,
    }
    out = os.path.join(REPO, f"TPCH_SF{label}.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: rec[k] for k in
                      ("metric", "sf", "value", "box_probe")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
