"""Deterministic sf1.0 scale-up: 10x the driver's sf0.1 testdata by key
remapping (the WatDiv-32M approach applied to the TPC-H-ish star schema).

The driver testdata is read-only and has no generator in-sandbox, so the
order-of-magnitude bench (r9 verdict #2) builds its input here: replica
r in 0..9 of every fact row gets keys offset by r * stride (a power of
10 above the table's key range), preserving every per-entity
distribution exactly — each customer keeps its order count, each order
its line count, each user its event history. Dimension tables (region,
nation) stay fixed, like TPC-H itself.

Content columns are made replica-distinct where identity matters:
- c_name / s_name gain a "#r<r>" suffix for r>0 (tpch_q21 groups by
  s_name — replicas must stay separate groups);
- document text has every 5th word (offset r) salted for r>0, so
  replicas are genuinely distinct documents (trigram jaccard ~0.3, not
  exact dupes) and the dedup family scales on realistic near-dup
  structure instead of 10-way exact clones;
- embeddings rotate by r components (norm-preserving; rotations of a
  random vector are ~orthogonal, so ANN/kmeans geometry stays
  non-degenerate).

Everything is a pure column expression — one Spark pass per table, no
driver loops; replicas come from explode(sequence(0,9)).

Usage: python tools/make_sf1.py [out_dir] [replicas]
  (defaults /root/repo/testdata_sf1, 10 — replicas=100 builds sf10, the
  100x-the-reference-scale input for tools/sf10_bench.py. Duplicate-
  cluster sizes grow with replicas: replicas sharing a salt residue are
  mutual near-dups, so near-dup OUTPUT volume grows faster than input —
  record output counts next to wall time when comparing scales.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# strides: a power of 10 strictly above each table's key range, so
# replica keys never collide and originals (r=0) are bit-identical
STRIDE = {
    "c_custkey": 100_000,
    "s_suppkey": 10_000,
    "p_partkey": 100_000,
    "o_orderkey": 1_000_000,
    "event_id": 1_000_000,
    "user_id": 10_000,
    "doc_id": 10_000,
    "vec_id": 10_000,
}


def _replicate(df, replicas):
    return df.withColumn(
        "__r", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1)))
    )


def _shift(col: str):
    return (F.col(col) + F.col("__r") * STRIDE[col]).alias(col)


def _suffix_name(col: str):
    # "#r1".."#r9" suffix for replicas so name-grouped queries keep
    # replica groups separate; r=0 rows stay byte-identical
    return F.when(F.col("__r") == 0, F.col(col)).otherwise(
        F.concat(F.col(col), F.lit("#r"), F.col("__r").cast("string"))
    ).alias(col)


def build(spark, out: str, replicas: int = REPLICAS) -> None:
    os.makedirs(out, exist_ok=True)
    rd = lambda t: spark.read.parquet(f"{SRC}/{t}.parquet")
    _rep = lambda df: _replicate(df, replicas)

    def write(df, t, parts):
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: {spark.read.parquet(f'{out}/{t}.parquet').count()} rows")

    # fixed dimensions
    for t in ("region", "nation"):
        write(rd(t), t, 1)

    c = _rep(rd("customer")).select(
        _shift("c_custkey"), _suffix_name("c_name"),
        "c_nationkey", "c_acctbal", "c_mktsegment",
    )
    write(c, "customer", 4)

    s = _rep(rd("supplier")).select(
        _shift("s_suppkey"), _suffix_name("s_name"), "s_nationkey", "s_acctbal",
    )
    write(s, "supplier", 2)

    p = _rep(rd("part")).select(
        _shift("p_partkey"), "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice",
    )
    write(p, "part", 4)

    o = _rep(rd("orders")).select(
        _shift("o_orderkey"),
        (F.col("o_custkey") + F.col("__r") * STRIDE["c_custkey"])
        .alias("o_custkey"),
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
    )
    write(o, "orders", 8)

    li = _rep(rd("lineitem")).select(
        (F.col("l_orderkey") + F.col("__r") * STRIDE["o_orderkey"])
        .alias("l_orderkey"),
        (F.col("l_partkey") + F.col("__r") * STRIDE["p_partkey"])
        .alias("l_partkey"),
        (F.col("l_suppkey") + F.col("__r") * STRIDE["s_suppkey"])
        .alias("l_suppkey"),
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    )
    write(li, "lineitem", 16)

    ev = _rep(rd("events")).select(
        _shift("event_id"), "ts",
        (F.col("user_id") + F.col("__r") * STRIDE["user_id"])
        .alias("user_id"),
        "event_type", "value", "props",
    )
    write(ev, "events", 8)

    # documents: salt every 5th word (offset r) so replicas are distinct
    # docs with realistic ~0.3 trigram jaccard to their base
    docs = _rep(rd("documents"))
    salted = F.when(F.col("__r") == 0, F.col("text")).otherwise(
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w, i: F.when(
                    (i % 5) == (F.col("__r") % 5),
                    F.concat(w, F.lit("~"), F.col("__r").cast("string")),
                ).otherwise(w),
            ),
            " ",
        )
    )
    d = docs.select(
        _shift("doc_id"), salted.alias("text"), "lang", "source",
        F.length(salted).cast("long").alias("n_chars"),
    )
    write(d, "documents", 4)

    # embeddings: rotate components by r (norm-preserving, ~orthogonal)
    emb = _rep(rd("embeddings"))
    dim = len(emb.select("embedding").first()[0])
    rot = F.col("__r") % dim  # r >= dim would slice past the array
    rotated = F.when(rot == 0, F.col("embedding")).otherwise(
        F.concat(
            F.slice(F.col("embedding"), rot + 1, F.lit(dim)),
            F.slice(F.col("embedding"), F.lit(1), rot),
        )
    )
    e = emb.select(_shift("vec_id"), rotated.alias("embedding"), "label")
    write(e, "embeddings", 2)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    n_rep = int(sys.argv[2]) if len(sys.argv) > 2 else REPLICAS
    from crux_spark import get_spark

    spark = get_spark("make-sf1", cpus=32, shuffle_partitions=32)
    build(spark, out, replicas=n_rep)
