"""Deduplication operators for document corpora.

Scale posture (100 TB): every variant is expressed as shuffle-on-key
DataFrame ops — no driver-side state, no O(n^2) comparisons. Candidate
generation always goes through a bucket-join (hash bucket, LSH band, or
shared shingle) so the quadratic blowup is confined to within-bucket
pairs; AQE's skew-join handling splits hot buckets.

- exact:        groupBy(md5(normalized text))
- ngram-jaccard: shingle explode -> shared-shingle candidate pairs ->
                 |intersection| / |union| (exact Jaccard, MinHash oracle)
- minhash-lsh:  k portable hash fns over shingles -> min per fn ->
                 band buckets -> bucket join (approx Jaccard at scale)
- simhash:      per-token 64-bit hashes -> bitwise majority -> hamming
                 bucket join
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# deterministic affine hash parameters for MinHash (public textbook
# construction: h_i(x) = (a_i * x + b_i) mod p). p = 2^31-1 keeps
# a*h + b inside int64 under ANSI arithmetic.
MERSENNE_P = (1 << 31) - 1


def _norm_text(col):
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups after whitespace/case normalization.

    Returns (content_hash, n_docs, keep_id, dup_ids) — one row per
    duplicated content value. Single shuffle on the content hash.
    """
    h = F.md5(_norm_text(F.col(text_col))).alias("content_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("dup_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def shingles(text, n: int = 3):
    """Word n-gram shingles of normalized text (array column)."""
    toks = F.split(_norm_text(text), " ")
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.4,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs sharing >=1
    shingle. Returns (id_a, id_b, jaccard) with id_a < id_b.

    The shared-shingle equi-join confines comparisons to plausible pairs;
    at 100 TB add a `F.hash(shingle) % B` bucket cap or MinHash-LSH
    (below) to bound candidate fan-out.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(F.col(text_col), n)).alias("sh"),
    )
    sizes = base.select("id", F.size("sh").alias("n_sh"))
    ex = base.select("id", F.explode("sh").alias("s"))
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """MinHash signature per document: sig[i] = min over shingles of
    h_i(xxhash64(shingle)). All JVM-side array ops — one projection, no
    shuffle."""
    sh = F.array_distinct(shingles(F.col(text_col), n))
    # materialize the per-shingle base hash ONCE, then derive all k minhash
    # permutations from the stored array — hashing shingles k times would
    # multiply the scan cost by k.
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.transform(sh, lambda s: F.abs(F.xxhash64(s)) % MERSENNE_P).alias("bh"),
    )

    def minhash_i(i: int):
        # NOTE: a 2-arg lambda in F.transform receives (element, index) —
        # capture i via this enclosing scope, never via a default arg.
        a, b = 2 * i + 1, 7 * i + 3
        return F.array_min(
            F.transform(F.col("bh"), lambda h: (h * F.lit(a) + F.lit(b)) % MERSENNE_P)
        )

    sig = F.array(*[minhash_i(i) for i in range(num_hashes)])
    return hashed.select("id", sig.alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.4,
) -> DataFrame:
    """MinHash + LSH banding near-dup candidates, verified with estimated
    Jaccard (signature agreement rate). Returns (id_a, id_b, est_jaccard).

    Scale path: band-bucket equi-join means candidate generation is a
    single shuffle on (band, bucket-hash); only banded collisions are
    compared.
    """
    rows = bands and num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.hash(F.slice("sig", bi * rows + 1, rows)).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return (
        cand.withColumn("est_jaccard", F.round(agree / F.lit(num_hashes), 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens: per-bit majority vote of
    token xxhash64 values. Pure array expressions, no shuffle."""
    toks = F.array_distinct(F.split(_norm_text(F.col(text_col)), " "))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def majority_bit(b: int):
        ones = F.size(
            F.filter(hashes, lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1)
        )
        return (
            F.when(ones * 2 > F.size(hashes), F.lit(1).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )

    expr = F.lit(0).cast("long")
    for b in range(64):
        expr = expr.bitwiseOR(F.shiftleft(majority_bit(b), b))
    return df.select(F.col(id_col).alias("id"), expr.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    band_bits: int = 16,
) -> DataFrame:
    """SimHash near-dup pairs via banded bucket join (pigeonhole: a pair
    within hamming distance d must agree on >=1 of d+1 disjoint bands;
    4x16-bit bands cover d<=3 exactly, larger d approximately)."""
    sh = simhash(df, id_col, text_col)
    nbands = 64 // band_bits
    mask = (1 << band_bits) - 1
    banded = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright("simhash", bi * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("bucket"),
                    )
                    for bi in range(nbands)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
