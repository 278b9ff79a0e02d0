"""Per-gate profiler for the optimization rounds: for each named gate,
time the Python-side frame BUILD (fn call: catalog work, Datalog
compilation, any eager sub-actions) separately from the EXECUTE
(noop-sink write of the returned frame, guide §1.4), run twice (cold +
warm), and optionally dump .explain('formatted') to a file.

Usage:
  python tools/profile_gate.py [--plans-dir DIR] [--suffix S] name [name ...]
  python tools/profile_gate.py --all           # every registered gate

Prints one line per gate:
  name  build_cold build_warm  exec_cold exec_warm  rows
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    plans_dir = None
    suffix = ""
    if "--plans-dir" in args:
        i = args.index("--plans-dir")
        plans_dir = args[i + 1]
        args = args[:i] + args[i + 2:]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        args = args[:i] + args[i + 2:]

    import __spark_entry__ as entrymod
    from crux_spark import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("crux-spark-profile")
    queries = entrymod.queries()
    names = list(queries) if "--all" in args else args
    if not names:
        print(__doc__)
        return 2

    # same warmup as bench.py so cold numbers aren't first-touch session cost
    from pyspark.sql import functions as F

    from crux_spark.queries import catalog_for

    cat = catalog_for(spark, sf_dir)
    cat.table("lineitem").count()
    docs_warm = cat.table("documents").select("doc_id", "text").limit(64)
    docs_warm.select(F.explode(F.split("text", " ")).alias("t")).groupBy(
        "t"
    ).count().count()
    docs_warm.mapInPandas(
        lambda it: (pdf.assign(n=pdf["text"].str.len()) for pdf in it),
        "doc_id long, text string, n long",
    ).count()

    print(f"{'gate':34s} {'bld_c':>6s} {'bld_w':>6s} {'exe_c':>6s} {'exe_w':>6s} rows")
    for name in names:
        fn = queries.get(name)
        if fn is None:
            print(f"{name:34s} UNKNOWN")
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        res = []
        df = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            n = len(df.collect())
            t2 = time.perf_counter()
            res.append((t1 - t0, t2 - t1))
            # same unpin discipline as bench.py's gate loop: without it,
            # dead gate-local localCheckpoint blocks accumulate and the
            # later gates measure memory pressure, not the query
            import gc as _gc

            _gc.collect()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
        print(
            f"{name:34s} {res[0][0]:6.2f} {res[1][0]:6.2f} "
            f"{res[0][1]:6.2f} {res[1][1]:6.2f} {n}"
        )
        sys.stdout.flush()
        if plans_dir and df is not None:
            os.makedirs(plans_dir, exist_ok=True)
            try:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
            with open(
                os.path.join(plans_dir, f"{name}{suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
