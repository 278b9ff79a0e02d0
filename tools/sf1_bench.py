"""Standing per-round sf1.0 bench (r10 verdict #8).

The one-off 10x bench in r10 (full 91-gate suite at sf1.0) caught a
real quadratic — MinHash-LSH band sizing — that the sf0.1 suite could
not. This tool makes the 10x signal a per-round artifact at bounded
cost: it times the HEAVIEST ~15 gates at sf1.0 (the deterministic 10x
expansion of sf0.1, tools/make_sf1.py) and records round-over-round
deltas in the same format as BENCH_r*.

Gate selection is sticky: if a previous BENCH_SF1.json exists, its
query set is reused so deltas compare the same work; otherwise the 15
heaviest gates from the current sf0.1 BENCH_PLANS.json seed the set.
A gate that LEFT the heaviest-15 at sf0.1 stays on the sf1 record —
scale regressions hide exactly in gates someone stopped watching.

Usage: python tools/sf1_bench.py [data_dir]
  data_dir: default /root/repo/testdata_sf1 (built on demand)
Writes BENCH_SF1.json (+ per-gate plans into BENCH_SF1_PLANS.json).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_GATES = 15


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    data_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "testdata_sf1"
    )
    bench = _load(os.path.join(REPO, "bench.py"), "bench")
    import __spark_entry__ as entrymod
    from crux_spark import get_spark

    spark = get_spark("sf1-bench")

    if not os.path.exists(os.path.join(data_dir, "lineitem.parquet")):
        print(f"# building sf1.0 data at {data_dir}", file=sys.stderr)
        make = _load(os.path.join(REPO, "tools", "make_sf1.py"), "make_sf1")
        make.build(spark, data_dir)

    # sticky gate set: previous sf1 record first, else heaviest at sf0.1
    prev: dict = {}
    sf1_path = os.path.join(REPO, "BENCH_SF1.json")
    if os.path.exists(sf1_path):
        with open(sf1_path) as f:
            prev = json.load(f)
    queries = entrymod.queries()
    if prev.get("gate_set"):
        names = [n for n in prev["gate_set"] if n in queries]
    else:
        try:
            with open(os.path.join(REPO, "BENCH_PLANS.json")) as f:
                sf01 = json.load(f).get("queries") or {}
        except (OSError, ValueError):
            sf01 = {}
        names = sorted(
            (n for n in sf01 if n in queries and sf01[n] > 0),
            key=lambda n: -sf01[n],
        )[:N_GATES]
        if not names:
            # fresh clone with no sf0.1 record yet: run bench.py first,
            # or fall back to the full registry head as a seed
            print(
                "# no prior gate timings — seeding from the first "
                f"{N_GATES} registry gates (run bench.py for a real seed)",
                file=sys.stderr,
            )
            names = list(queries)[:N_GATES]
    # pairgen sharing: same bench-only memoization as the sf0.1 suite
    os.environ.setdefault("CRUX_SPARK_BENCH_SHARE", "1")

    timings: dict[str, float] = {}
    plans: dict[str, dict | None] = {}
    shared_pairgen = 0.0
    if os.environ.get("CRUX_SPARK_BENCH_SHARE") == "1" and any(
        n.startswith("dedup_") for n in names
    ):
        from crux_spark.queries import _ngram_pairs_for, catalog_for

        t0 = time.perf_counter()
        _ngram_pairs_for(catalog_for(spark, data_dir), data_dir, threshold=0.5).count()
        shared_pairgen = time.perf_counter() - t0
        print(f"# shared pair-gen: {shared_pairgen:.2f}s", file=sys.stderr)

    total = 0.0
    for name in names:
        fn = queries[name]
        try:
            dt, df, n = bench._timed_run(fn, spark, data_dir)
        except Exception as e:
            print(f"# sf1 bench error in {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
            continue
        plans[name] = bench._fingerprint(df)
        del df
        t1 = time.perf_counter()
        fn(spark, data_dir).collect()
        dt = min(dt, time.perf_counter() - t1)
        timings[name] = round(dt, 2)
        total += dt
        print(f"# {name}: {dt:.2f}s rows={n}", file=sys.stderr)
        bench._cleanup(spark)
    if shared_pairgen:
        timings["dedup_pairgen_shared"] = round(shared_pairgen, 2)
        total += shared_pairgen

    prev_q = prev.get("queries") or {}
    deltas = {
        n: round(timings[n] - prev_q[n], 2)
        for n in timings
        if n in prev_q and timings[n] > 0 and prev_q[n] > 0
    }
    rec = {
        "metric": "sf1_gate_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": 1.0,
        "gate_set": names,
        "deltas_vs_prev": deltas,
        "prev_total": prev.get("value"),
        # the r10 full-91-gate baseline stays citable even after this
        # record narrows to the heavy set
        "full_suite_r10_s": prev.get("full_suite_r10_s", prev.get("value")),
    }
    with open(sf1_path, "w") as f:
        json.dump(rec, f, indent=1)
    with open(os.path.join(REPO, "BENCH_SF1_PLANS.json"), "w") as f:
        json.dump({"sf": 1.0, "queries": timings, "plans": plans}, f, indent=1)
    print(json.dumps({k: v for k, v in rec.items() if k != "gate_set"}))


if __name__ == "__main__":
    main()
