"""Full-text search: tokenized inverted index + TF-IDF relevance join.

The reference plugs Lucene in as Datalog predicates ``text-search`` /
``wildcard-text-search`` returning scored ``[e v score]`` relations
(crux-lucene/src/crux/lucene.clj:146-188), maintained by replaying the tx
log (SURVEY.md §2.10). The Spark recast: the inverted index IS a DataFrame
— (term, eid, tf) + a doc-frequency table — derived from the snapshot and
kept fresh by the same streaming foreachBatch that maintains the documents
table. Scoring is the standard tf-idf dot product, computed as a join +
groupBy (two shuffles on term/eid, both broadcast-able for small query
term sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokenize(col):
    return F.split(F.regexp_replace(F.lower(col), r"[^a-z0-9\s]", " "), r"\s+")


def build_text_index(
    df: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame, int]:
    """Returns (postings, doc_freq, n_docs): postings (term, eid, tf);
    doc_freq (term, df). Persist both as parquet partitioned/bucketed by
    term at scale."""
    toks = df.select(
        F.col(id_col).alias("eid"), F.explode(_tokenize(F.col(text_col))).alias("term")
    ).filter(F.length("term") > 0)
    postings = toks.groupBy("term", "eid").agg(F.count("*").alias("tf"))
    doc_freq = postings.groupBy("term").agg(F.count_distinct("eid").alias("df"))
    n_docs = df.count()
    return postings, doc_freq, n_docs


def text_search(
    postings: DataFrame,
    doc_freq: DataFrame,
    n_docs: int,
    query: str,
    limit: int | None = None,
) -> DataFrame:
    """Score documents for a free-text query: sum over query terms of
    tf * ln(1 + N/df). Returns (eid, score) descending — the analogue of
    the reference's scored Lucene relation (lucene.clj:146-188)."""
    spark = postings.sparkSession
    terms = [
        t
        for t in query.lower().replace(",", " ").split()
        if t
    ]
    qdf = spark.createDataFrame([(t,) for t in set(terms)], ["term"])
    scored = (
        postings.join(F.broadcast(qdf), "term")
        .join(F.broadcast(doc_freq), "term")
        .withColumn("w", F.col("tf") * F.log(1.0 + F.lit(float(n_docs)) / F.col("df")))
        .groupBy("eid")
        .agg(F.round(F.sum("w"), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("eid").asc())
    )
    return scored.limit(limit) if limit else scored


def wildcard_text_search(
    postings: DataFrame,
    doc_freq: DataFrame,
    n_docs: int,
    pattern: str,
    limit: int | None = None,
) -> DataFrame:
    """Prefix/wildcard term match (lucene.clj wildcard variant): pattern
    like 'fore*' matches any term with that prefix."""
    regex = "^" + pattern.replace("*", ".*") + "$"
    matched = doc_freq.filter(F.col("term").rlike(regex))
    scored = (
        postings.join(F.broadcast(matched), "term")
        .withColumn("w", F.col("tf") * F.log(1.0 + F.lit(float(n_docs)) / F.col("df")))
        .groupBy("eid")
        .agg(F.round(F.sum("w"), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("eid").asc())
    )
    return scored.limit(limit) if limit else scored
