"""sf10 bench (r11 verdict #6): push the two LSH-heavy gates one more
decade out — 100x the reference's own timed scale (BASELINE.md times the
reference at sf0.05; this input is a deterministic 100x expansion of
sf0.1, tools/make_sf1.py with replicas=100).

Why these two gates: both auto-size their LSH parameters to the corpus
((r, b) growth law, similarity.py:_lsh_params / the 16x2 minhash
banding), and both have a history of looking fine at 10x and going
quadratic at the next decade (the r9 fixed-band quadratic was only
caught by the sf1.0 bench). This pins the growth law empirically at
sf10 and records the parameters actually used.

Duplicate-cluster caveat (make_sf1.py docstring): replicas sharing a
salt residue are mutual near-dups, so OUTPUT pair volume grows faster
than input rows — rows_out is recorded next to wall so the reader
normalizes cost-per-pair, and the sub-quadratic wall check compares
against the sf1 record scaled by input growth (10x) with the same
x30 noise allowance the scale smoke uses.

Usage: python tools/sf10_bench.py [data_dir]
  data_dir: default /root/repo/testdata_sf10 (built on demand, ~1.8 GB)
Writes BENCH_SF10.json.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GATES = (
    "dedup_minhash_lsh",
    "embedding_near_dup_lsh",
    # r12 verdict #4: the pairgen family — dedup_pairgen_shared is the
    # historically twitchiest gate (r10 13.5s record, r11 47s box scare,
    # r12 adjudication) and dedup_substring_spans consumes its shingle
    # relation. Timed here one decade further out, rows_out recorded.
    "dedup_substring_spans",
)


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    data_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "testdata_sf10"
    )
    bench = _load(os.path.join(REPO, "bench.py"), "bench")
    import __spark_entry__ as entrymod
    from crux_spark import get_spark

    spark = get_spark("sf10-bench")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(os.path.join(data_dir, "documents.parquet")):
        print(f"# building sf10 data at {data_dir}", file=sys.stderr)
        make = _load(os.path.join(REPO, "tools", "make_sf1.py"), "make_sf1")
        make.build(spark, data_dir, replicas=100)

    queries = entrymod.queries()
    rec: dict = {"sf": 10.0, "queries": {}, "rows_out": {}, "params": {}}
    rec["box_probe"] = bench._box_probe()

    # Shared ngram pair generation, timed explicitly like the sf0.1/sf1
    # suites (CRUX_SPARK_BENCH_SHARE memoization): the substring-span
    # consumer then reads the checkpointed pairs, so the pairgen wall is
    # recorded once under its own name instead of hiding in a consumer.
    os.environ.setdefault("CRUX_SPARK_BENCH_SHARE", "1")
    if os.environ.get("CRUX_SPARK_BENCH_SHARE") == "1":
        from crux_spark.queries import _ngram_pairs_for, catalog_for

        cat = catalog_for(spark, data_dir)
        t0 = time.perf_counter()
        n_pairs = len(_ngram_pairs_for(cat, data_dir, threshold=0.5).collect())
        dt = time.perf_counter() - t0
        rec["queries"]["dedup_pairgen_shared"] = round(dt, 2)
        rec["rows_out"]["dedup_pairgen_shared"] = n_pairs
        print(f"# dedup_pairgen_shared: {dt:.2f}s rows_out={n_pairs}",
              file=sys.stderr)
        bench._cleanup(spark)

    # the parameters each gate will actually use at this corpus size
    from crux_spark.operators.similarity import _lsh_params

    n_emb = spark.read.parquet(
        os.path.join(data_dir, "embeddings.parquet")
    ).count()
    n_docs = spark.read.parquet(
        os.path.join(data_dir, "documents.parquet")
    ).count()
    # embedding gate augments with ~10% perturbed copies before sizing
    r_pl, b_bands = _lsh_params(int(n_emb * 1.1), threshold=0.98)
    rec["params"]["embedding_near_dup_lsh"] = {
        "n_vectors": n_emb, "planes_per_band": r_pl, "bands": b_bands,
    }
    rec["params"]["dedup_minhash_lsh"] = {
        "n_docs": n_docs, "num_hashes": 32, "bands": 16, "rows_per_band": 2,
    }

    total = 0.0
    for name in GATES:
        t0 = time.perf_counter()
        df = queries[name](spark, data_dir)
        n = len(df.collect())
        dt = time.perf_counter() - t0
        rec["queries"][name] = round(dt, 2)
        rec["rows_out"][name] = n
        total += dt
        print(f"# {name}: {dt:.2f}s rows_out={n}", file=sys.stderr)
        bench._cleanup(spark)

    # sub-quadratic check vs the standing sf1 record (10x less input):
    # wall must stay under 10x-input x 30-noise of the sf1 number
    sf1_path = os.path.join(REPO, "BENCH_SF1.json")
    verdicts = {}
    if os.path.exists(sf1_path):
        with open(sf1_path) as f:
            sf1_q = json.load(f).get("queries") or {}
        for name in rec["queries"]:
            prev = sf1_q.get(name)
            if prev and prev > 0:
                ratio = rec["queries"][name] / prev
                verdicts[name] = {
                    "sf1_sec": prev,
                    "ratio_vs_sf1": round(ratio, 1),
                    "sub_quadratic": ratio < 100,  # 10x input, 100x = quad
                }
    rec["vs_sf1"] = verdicts
    rec["total_sec"] = round(total, 2)

    out = os.path.join(REPO, "BENCH_SF10.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    bad = [k for k, v in verdicts.items() if not v["sub_quadratic"]]
    if bad:
        print(f"# FAIL: super-quadratic growth in {bad}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
