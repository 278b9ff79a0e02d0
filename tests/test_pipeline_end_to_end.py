"""End-to-end training-data pipeline over the driver testdata: quality
filter -> exact dedup -> near-dup pairs -> connected-components keep
list -> chunk scrub -> benchmark decontamination -> deterministic
sample/split -> mixture -> token accounting. Each stage is an operator
gated elsewhere; this test asserts the COMPOSITION holds its invariants
(monotone shrinkage, disjoint splits, deterministic reruns)."""

import pytest
from pyspark.sql import functions as F

from crux_spark.catalog import Catalog
from crux_spark.operators import dedup, graph, sampling, textops


@pytest.fixture(scope="module")
def docs(spark):
    return Catalog(spark, "/root/testdata/sf0.01").table("documents")


def test_training_pipeline_composition(docs):
    n0 = docs.count()

    # 1. quality filter: keep plausible-language docs
    toks = textops.token_count(F.col("text"))
    filtered = docs.filter((toks >= 10) & (textops.punct_ratio(F.col("text")) < 0.3))
    n1 = filtered.count()
    assert 0 < n1 <= n0

    # 2. exact dedup: drop non-canonical exact copies
    groups = dedup.exact_duplicates(filtered)
    drop_exact = groups.select(
        F.explode("dup_ids").alias("doc_id"), F.col("keep_id")
    ).filter(F.col("doc_id") != F.col("keep_id")).select("doc_id")
    stage2 = filtered.join(drop_exact, "doc_id", "left_anti")
    n2 = stage2.count()
    assert n2 <= n1

    # 3. near-dup pairs -> transitive clusters -> canonical survivors
    pairs = dedup.ngram_jaccard_pairs(stage2, threshold=0.5)
    keep = graph.dedup_keep_list(pairs)
    drop_near = keep.filter(F.col("doc_id") != F.col("keep_id")).select("doc_id")
    stage3 = stage2.join(drop_near, "doc_id", "left_anti")
    n3 = stage3.count()
    assert n3 <= n2

    # 4. chunk-level scrub (repeated-passage removal), text rewritten
    scrubbed = sampling.dedup_text_chunks(stage3, chunk_words=8).withColumnRenamed(
        "clean_text", "text"
    )
    n4 = scrubbed.count()
    assert 0 < n4 <= n3

    # 5. decontamination vs a held-out "benchmark" slice
    bench = scrubbed.filter(F.col("doc_id") % 97 == 0)
    train_pool = scrubbed.filter(F.col("doc_id") % 97 != 0)
    contaminated = sampling.contaminated_docs(train_pool, bench, n=5)
    clean = train_pool.join(contaminated.select("doc_id"), "doc_id", "left_anti")
    n5 = clean.count()
    assert n5 <= train_pool.count()

    # 6. deterministic split: disjoint, exhaustive, rerun-stable
    train, test = sampling.hash_split(clean, 0.1, "doc_id")
    tr = {r.doc_id for r in train.select("doc_id").collect()}
    te = {r.doc_id for r in test.select("doc_id").collect()}
    assert tr.isdisjoint(te) and len(tr) + len(te) == n5
    train2, _ = sampling.hash_split(clean, 0.1, "doc_id")
    assert {r.doc_id for r in train2.select("doc_id").collect()} == tr

    # 7. mixture with epochs: weighted token budget is reproducible
    mixed = sampling.mix_corpora([(train, 1.5)], method="md5")
    budget = mixed.agg(
        F.sum(textops.bpe_ish_token_count(F.col("text"))).alias("tokens")
    ).first().tokens
    budget2 = sampling.mix_corpora([(train, 1.5)], method="md5").agg(
        F.sum(textops.bpe_ish_token_count(F.col("text"))).alias("tokens")
    ).first().tokens
    assert budget == budget2 and budget > 0
