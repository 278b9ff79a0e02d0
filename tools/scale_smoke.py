"""10x scale smoke for the iterative/graph operators (round-4 protocol,
extending NOTES_r3's sweep to connected components and the recursive
fixpoint): run each op on a 1x and a 10x input with the SAME bounded
diameter, and assert

  - wall time grows sub-quadratically (well under 100x for 10x data), and
  - ROUND COUNTS stay flat (log-bounded in diameter, independent of
    graph size) — the property that matters at 100 TB, where per-round
    job latency is the one cost Spark cannot amortize.

Usage: python tools/scale_smoke.py   (prints a table + PASS/FAIL)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def chain_edges(spark, n_chains: int, length: int, offset: int = 0):
    """n_chains disjoint directed chains of `length` edges each: vertex
    ids c*10_000_000 + i. Diameter is `length` regardless of n_chains —
    scaling n_chains 10x grows the data 10x at constant diameter."""
    return (
        spark.range(n_chains)
        .select((F.col("id") + offset).alias("c"))
        .select(
            "c", F.explode(F.sequence(F.lit(0), F.lit(length - 1))).alias("i")
        )
        .select(
            (F.col("c") * 10_000_000 + F.col("i")).alias("id_a"),
            (F.col("c") * 10_000_000 + F.col("i") + 1).alias("id_b"),
        )
        .localCheckpoint()
    )


def run_cc(spark, n_chains: int, length: int):
    from crux_spark.operators.graph import connected_components

    edges = chain_edges(spark, n_chains, length)
    stats: dict = {}
    t0 = time.monotonic()
    out = connected_components(
        edges, driver_limit_edges=0, stats=stats
    )  # force the distributed path
    n = out.count()
    dt = time.monotonic() - t0
    # every chain collapses to one component labeled by its min vertex
    n_comp = out.select("component").distinct().count()
    assert n_comp == n_chains, (n_comp, n_chains)
    assert n == n_chains * (length + 1), n
    return dt, stats["rounds"]


def run_reach(spark, n_chains: int, length: int):
    """Transitive closure of the chain graph through the Datalog
    recursive-rule path (TC squaring)."""
    from crux_spark.catalog import Catalog
    from crux_spark.datalog import compile as dcompile
    from crux_spark.datalog import q

    edges = chain_edges(spark, n_chains, length).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    cat = Catalog(spark)
    cat.add_documents(
        "edges", edges.withColumn("_id", F.concat_ws("_", "src", "dst"))
    )
    dcompile.FIXPOINT_STATS["tc_rounds"] = 0
    dcompile.FIXPOINT_STATS["fixpoint_rounds"] = 0
    t0 = time.monotonic()
    out = q(
        cat,
        {
            "find": ["?x", "?y"],
            "where": [["reach", "?x", "?y"]],
            "rules": [
                [["reach", "?x", "?y"], ["?e", ":src", "?x"], ["?e", ":dst", "?y"]],
                [
                    ["reach", "?x", "?y"],
                    ["?e", ":src", "?x"],
                    ["?e", ":dst", "?z"],
                    ["reach", "?z", "?y"],
                ],
            ],
        },
    )
    n = out.count()
    dt = time.monotonic() - t0
    # closure of one chain of L edges = L*(L+1)/2 pairs
    assert n == n_chains * length * (length + 1) // 2, n
    rounds = (
        dcompile.FIXPOINT_STATS["tc_rounds"]
        or dcompile.FIXPOINT_STATS["fixpoint_rounds"]
    )
    return dt, rounds


def run_pack(spark, n_chains: int, length: int):
    """Sequence packing over n_chains*length docs — the distributed
    two-pass prefix-sum must stay linear (no single-task global
    window). 'rounds' is fixed at 2 (local cumsum pass + bucket-offset
    pass) by construction."""
    from crux_spark.operators.sampling import pack_sequences

    n = n_chains * length
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id"), F.lit(95)) + 5).alias("n_tok"),
    )
    t0 = time.monotonic()
    out = pack_sequences(docs, seq_len=2048, count_col="n_tok")
    rows = out.count()
    dt = time.monotonic() - t0
    assert rows >= n  # every doc appears in >= 1 sequence span
    return dt, 2


def main() -> int:
    from crux_spark import get_spark

    spark = get_spark("scale-smoke", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    failures = []
    print(f"{'op':<22}{'scale':>6}{'rows-in':>10}{'sec':>8}{'rounds':>8}")
    for name, fn, base in (
        ("connected_components", run_cc, 2_000),
        ("recursive_reach_tc", run_reach, 2_000),
        ("pack_sequences", run_pack, 20_000),
    ):
        length = 16  # constant diameter across scales
        t1, r1 = fn(spark, base, length)
        t10, r10 = fn(spark, base * 10, length)
        print(f"{name:<22}{'1x':>6}{base * length:>10}{t1:>8.2f}{r1:>8}")
        print(f"{name:<22}{'10x':>6}{base * 10 * length:>10}{t10:>8.2f}{r10:>8}")
        if r10 > r1 + 1:  # rounds must be diameter-bound, not size-bound
            failures.append(f"{name}: rounds grew {r1} -> {r10}")
        if t10 > max(t1, 0.5) * 30:  # sub-quadratic wall guard (noisy box)
            failures.append(f"{name}: time grew {t1:.2f}s -> {t10:.2f}s")
    if failures:
        print("FAIL:", "; ".join(failures))
        return 1
    print("PASS: rounds flat, time sub-quadratic at 10x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
