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

# Memoized constant Column lists (r15 optimization): the MinHash
# permutation aggregates, LSH band structs and SimHash bit
# aggregates/packing are pure unresolved expression trees that depend
# only on their integer parameters — building them costs hundreds of
# py4j round trips per call (the 64-bit SimHash pack alone is ~400),
# which dominated these operators' driver-side build time. Cached per
# (JVM gateway, params); a fresh JVM invalidates the cache.
_EXPR_CACHE: dict[tuple, object] = {}


def _gateway_key() -> int:
    from crux_spark._jvmcache import gateway_token

    return gateway_token()


def _expr_cached(tag: str, params: tuple, build):
    key = (_gateway_key(), tag, params)
    hit = _EXPR_CACHE.get(key)
    if hit is None:
        if any(k[0] != key[0] for k in _EXPR_CACHE):
            _EXPR_CACHE.clear()  # fresh JVM: old handles are dead
        hit = _EXPR_CACHE[key] = build()
    return hit


def _norm_text(col):
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def _spread(df: DataFrame) -> DataFrame:
    """Repartition to the session's parallelism before CPU-heavy per-row
    expression work. Document corpora often arrive as few large files, and
    AQE coalesces byte-small shuffles — but shingling/hashing cost is per
    ROW, not per byte, so an explicit spread keeps all cores busy.

    Conditional (r15 optimization, guide §2.4): the spread only pays off
    when the source scan CANNOT fill the session's cores on its own. A
    corpus whose Catalyst size estimate already spans >= parallelism scan
    splits (estimate / maxPartitionBytes) gains nothing from the
    repartition — it would shuffle the full text payload just to land at
    the same parallelism the scan provides, which at 100 TB is a
    pointless full-corpus exchange. Small inputs (the few-large-files
    case this helper exists for) keep the spread."""
    from crux_spark._conf import parse_byte_size

    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    try:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        # unit-suffixed values ("128m", "64MB") parse correctly (r15
        # advice: the rstrip('b')+int form raised and silently disabled
        # the skip under any human-readable config)
        max_pb = parse_byte_size(
            df.sparkSession.conf.get(
                "spark.sql.files.maxPartitionBytes", None
            ),
            128 << 20,
        )
        if est >= par * max_pb:
            return df
    except Exception:
        pass
    return df.repartition(par)


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
    """Word n-gram shingles of normalized text (array column).

    NOTE: when `text` is a raw expression (not a bound column), the
    transform lambda re-evaluates the whole normalize+split tree per
    element — prefer `exploded_shingles` below on DataFrames, which
    materializes the token array once per row first (measured ~5x on
    the dedup bench)."""
    toks = F.split(_norm_text(text), " ")
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, s) rows: DISTINCT word n-gram shingles per document, with
    the token array materialized as a column before the window slide so
    the per-element lambda only does array access."""
    toks = F.split(_norm_text(F.col(text_col)), " ")
    t = _spread(df).select(F.col(id_col).alias("id"), toks.alias("__toks"))
    k = F.size("__toks") - (n - 1)
    arr = F.when(k <= 0, F.array(F.concat_ws(" ", F.col("__toks")))).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i + 1, n)),
        )
    )
    return t.select("id", F.explode(F.array_distinct(arr)).alias("s"))


def _exploded_shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, h) rows: DISTINCT 64-bit hashes of word n-gram shingles,
    hashing each token window DIRECTLY with multi-arg xxhash64 — no
    per-position slice+concat string allocation and long (not string)
    array_distinct/explode. Measured 2x the string form (sf0.1, warm
    0.52 -> 0.27s noop). ONLY for consumers whose results are provably
    hash-independent (ngram_jaccard_pairs: prefix filtering is exact
    under ANY global order and candidates are exact-verified); MinHash
    paths keep hashing the shingle STRING (shingle_hashes) because
    signature values — and the oracle-pinned banding-recall property —
    depend on them. Tokens carry no spaces (split on ' '), so
    string-concat identity and token-tuple identity coincide; collision
    odds are the same 64-bit ~1e-10 class as the string form."""
    toks = F.split(_norm_text(F.col(text_col)), " ")
    t = _spread(df).select(F.col(id_col).alias("id"), toks.alias("__toks"))
    k = F.size("__toks") - (n - 1)
    harr = F.when(
        k <= 0, F.array(F.xxhash64(F.concat_ws(" ", F.col("__toks"))))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.xxhash64(
                *[F.element_at(F.col("__toks"), i + j + 1) for j in range(n)]
            ),
        )
    )
    return t.select("id", F.explode(F.array_distinct(harr)).alias("h"))


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
    # Prefix filtering (exact similarity join): under ANY fixed global
    # ordering of shingles, two sets with Jaccard >= t must share an element
    # within each set's first |S| - ceil(t*|S|) + 1 shingles. Ordering by
    # ascending GLOBAL document frequency puts the rarest shingles in the
    # prefixes, so candidate pairs come from rare-shingle collisions — the
    # hot-shingle pair explosion of a naive shared-shingle join disappears
    # while the result set stays exactly the same.
    # shingles are carried as 64-bit xxhash values from here on: set
    # operations on long arrays are far cheaper than on strings, and at
    # ~2^32 distinct shingles the collision probability is still ~1e-10.
    # r16: hash the token windows directly (_exploded_shingle_hashes) —
    # same sets, no transient shingle strings.
    # r16: document frequency as count() OVER (PARTITION BY h) instead
    # of groupBy(h)+join-back — (id, h) rows are distinct per doc
    # (array_distinct upstream), so the window count equals the groupBy
    # count row for row, and the self-join on h (plus the checkpoint
    # that existed only to share the exploded relation between the
    # aggregate and the join side) disappears: one exchange on h feeds
    # the frequency directly into each row. Same-session interleaved
    # A/B at sf0.1: 3.53/4.18/3.36 -> 3.22/3.20/2.85s e2e, identical
    # 256 pairs; one fewer synchronous checkpoint planning pass.
    ex = _exploded_shingle_hashes(df, id_col, text_col, n)
    dfc = F.count("*").over(Window.partitionBy("h"))
    base = (
        ex.select("id", F.struct(dfc.alias("c"), F.col("h")).alias("__st"))
        .groupBy("id")
        .agg(F.array_sort(F.collect_list("__st")).alias("shc"))
        .select(
            "id",
            F.transform("shc", lambda st: st["h"]).alias("sh"),
            F.size("shc").alias("n_sh"),
        )
        # Size-aware pin (guide §5). base feeds THREE consumers (the
        # prefix explode + both verify sides). Below the threshold it
        # stays lazy: the AQE stage cache already shares the shuffle map
        # outputs, and an interleaved warm-codegen A/B at sf0.1 is a
        # wash (4.3-5.3s lazy vs 4.8-5.4s pinned), so the small-corpus
        # case keeps the cheaper no-checkpoint plan. Above it, the pin
        # is decisive: at 10x (sf1, 1.2M candidates) the verify stage
        # over the UNPINNED lineage burns 257-333s CPU (21-22s gate
        # wall) where the pinned form's verify runs in 48-62s CPU
        # (5.0-5.9s wall, interleaved fresh-JVM A/B, identical 2560
        # pairs) — the join's build sides and the jaccard condition
        # evaluate far cheaper over a materialized scan than over the
        # recomputed aggregate lineage, and the gap grows with the
        # candidate count.
    )
    import os

    from crux_spark._conf import parse_byte_size

    thr = parse_byte_size(
        os.environ.get("CRUX_SPARK_PAIRGEN_PIN_MIN_BYTES"), 4 << 20
    )
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        est = 0
    if 0 < est < (1 << 62) and est >= thr:
        base = base.localCheckpoint()
    prefix_len = F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    prefixes = base.select(
        "id", F.explode(F.slice("sh", 1, prefix_len.cast("int"))).alias("s")
    )
    a, b = prefixes.alias("a"), prefixes.alias("b")
    cand = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    # r16: explicit repartition, not _spread — the verify is per-ROW CPU
    # (array_intersect over full shingle arrays) on a byte-tiny pair
    # list, so AQE coalesces it to a handful of tasks, and _spread's
    # byte estimate is useless here (Catalyst's self-join cardinality
    # estimate inflates it past the skip threshold). The (id_a, id_b)
    # shuffle is ~16 bytes/row and parallelism scales with the cluster.
    # Interleaved A/B at sf0.1: 3.35-3.81 -> 2.15-2.35s e2e, same 256
    # pairs (verify stage 3 -> 32 tasks).
    cand = cand.repartition(cand.sparkSession.sparkContext.defaultParallelism)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def shingle_hashes(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3,
    hash_fn=None,
) -> DataFrame:
    """Flat (id, h) rows: distinct 64-bit xxhash shingle values per doc —
    the shared input of MinHash signatures AND exact set verification.
    h stays full-width 64-bit (collision odds ~1e-10 at test scale); the
    signature step reduces mod p itself.

    ``hash_fn`` (Column -> integer Column) overrides the shingle hash;
    the default is xxhash64 (fast, JVM-native). Oracle-gated tests pass
    an external-engine-reproducible hash (e.g. an md5-prefix integer)
    so a SQL system with no xxhash64 can recompute identical
    signatures."""
    h = (hash_fn or F.xxhash64)(F.col("s"))
    return exploded_shingles(df, id_col, text_col, n).select(
        "id", h.alias("h")
    )


def md5_prefix_hash(c):
    """Portable shingle hash: the first 15 hex digits of md5 as a 60-bit
    non-negative integer — byte-identical in any engine with md5 +
    hex parsing (DuckDB: CAST('0x' || substr(md5(s),1,15) AS BIGINT)).
    Slower than xxhash64; used where an external oracle must reproduce
    MinHash signatures exactly."""
    return F.conv(
        F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10
    ).cast("long")


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    exploded: DataFrame | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """MinHash signature per document: sig[i] = min over shingles of
    h_i(xxhash64(shingle)). All JVM-side array ops — one projection, no
    shuffle.

    ``checkpoint=False`` skips the trailing localCheckpoint: callers
    whose FIRST consumer is itself checkpointed (banded_signatures in
    the LSH paths) get nothing from it but a synchronous Catalyst
    planning pass (~0.5s/call of pure driver time)."""
    # flat (id, base_hash) rows + ONE hash-aggregate computing all k
    # minhash permutations as min() aggs — vectorized hash agg instead of
    # k nested array transforms per row (an order of magnitude faster at
    # bench scale, same single shuffle on id).
    if exploded is None:
        exploded = shingle_hashes(df, id_col, text_col, n)
    hp = (F.abs(F.col("h")) % MERSENNE_P).alias("h")
    aggs = _expr_cached("minhash_aggs", (num_hashes,), lambda: [
        F.min((F.col("h") * F.lit(2 * i + 1) + F.lit(7 * i + 3)) % MERSENNE_P).alias(
            f"m{i}"
        )
        for i in range(num_hashes)
    ])
    sig_arr = _expr_cached("minhash_sig_arr", (num_hashes,), lambda: F.array(
        *[F.col(f"m{i}") for i in range(num_hashes)]
    ).alias("sig"))
    sigs = exploded.select("id", hp).groupBy("id").agg(*aggs)
    out = sigs.select("id", sig_arr)
    if checkpoint:
        # signatures feed both sides of the LSH self-join
        out = out.localCheckpoint(eager=False)
    return out


def _per_doc_sig_sets(ex: DataFrame, num_hashes: int) -> DataFrame:
    """ONE aggregation computing each doc's minhash signature AND its
    distinct shingle-hash set from flat (id, h) rows: (id, sh, sig).

    The exact-verify LSH paths previously ran two aggregations over a
    checkpointed exploded frame (collect_set for verification, min-aggs
    for signatures) — same shuffle key, two planning passes, plus the
    big flat (id, h) relation held as cached blocks. Fusing them keeps
    one shuffle, one synchronous planning pass, and caches only the
    per-doc rows. The min-agg arithmetic inlines the abs(h) % p
    projection unchanged (p = 2^31-1, so h' * 63 + c fits a long) —
    signature values are byte-identical to minhash_signatures'."""
    aggs = _expr_cached("minhash_aggs_raw", (num_hashes,), lambda: [
        F.min(
            ((F.abs(F.col("h")) % MERSENNE_P) * F.lit(2 * i + 1)
             + F.lit(7 * i + 3)) % MERSENNE_P
        ).alias(f"m{i}")
        for i in range(num_hashes)
    ])
    sig_arr = _expr_cached("minhash_sig_arr", (num_hashes,), lambda: F.array(
        *[F.col(f"m{i}") for i in range(num_hashes)]
    ).alias("sig"))
    return ex.groupBy("id").agg(
        F.collect_set("h").alias("sh"), *aggs
    ).select("id", "sh", sig_arr)


def banded_signatures(
    sigs: DataFrame, num_hashes: int, bands: int
) -> DataFrame:
    """Explode (id, sig) into (id, sig, band, bucket) LSH band rows —
    the persistable incremental LSH index (each row is one posting in a
    band's bucket)."""
    rows = num_hashes // bands
    bb = _expr_cached("lsh_bands", (num_hashes, bands), lambda: F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.hash(F.slice("sig", bi * rows + 1, rows)).alias("bucket"),
                )
                for bi in range(bands)
            ]
        )
    ).alias("bb"))
    return sigs.select("id", "sig", bb).select(
        "id", "sig", "bb.band", "bb.bucket"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.4,
    verify: str = "est",
) -> DataFrame:
    """MinHash + LSH banding near-dup candidates.

    verify="est": candidates verified with estimated Jaccard (signature
    agreement rate) — cheapest, fully map-side. Returns
    (id_a, id_b, est_jaccard).
    verify="exact": candidates verified with EXACT shingle-set Jaccard
    (one join back to the shingle sets) — the production dedup shape:
    LSH bounds the candidate set, the exact check removes false
    positives, so the output equals the exact similarity join wherever
    banding recall holds. Returns (id_a, id_b, jaccard).

    Scale path: band-bucket equi-join means candidate generation is a
    single shuffle on (band, bucket-hash); only banded collisions are
    compared.
    """
    # one shingling pass feeds BOTH the signatures and (in exact mode)
    # the verification sets — in exact mode fused into a single per-doc
    # aggregation (_per_doc_sig_sets): one shuffle, one checkpoint
    ex = shingle_hashes(df, id_col, text_col, n)
    per_doc = None
    if verify == "exact":
        per_doc = _per_doc_sig_sets(ex, num_hashes).localCheckpoint(
            eager=False
        )
        sigs = per_doc.select("id", "sig")
    else:
        sigs = minhash_signatures(
            df, id_col, text_col, n, num_hashes, exploded=ex,
            checkpoint=False,  # banded is checkpointed right below
        )
    banded = banded_signatures(sigs, num_hashes, bands).localCheckpoint(eager=False)
    a = banded.alias("a")
    b = banded.alias("b")
    joined = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.id") < F.col("b.id")),
    )
    if verify == "exact":
        # dedup candidates BEFORE the shingle-set join: the exact check
        # is the expensive step here, so it must see each pair once
        cand = joined.select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        ).dropDuplicates(["id_a", "id_b"])
        sets = per_doc.select("id", "sh")
        sa = sets.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
        sb = sets.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
        n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
        return (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn(
                "jaccard",
                F.round(
                    n_inter / (F.size("sh_a") + F.size("sh_b") - n_inter), 6
                ),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    # verify (cheap map-side zip) BEFORE dedup: within-bucket pair counts
    # are quadratic in bucket size, so the dedup shuffle must only see the
    # surviving pairs, not the raw candidate explosion
    return (
        joined.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .withColumn("est_jaccard", F.round(agree / F.lit(num_hashes), 6))
        .filter(F.col("est_jaccard") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens: per-bit majority vote of
    token xxhash64 values. Pure array expressions, no shuffle."""
    # flat (id, token_hash) rows + one hash-aggregate summing each of the
    # 64 bit positions; per-bit majority then packs into the hash — again
    # vectorized agg instead of 64 nested filter-lambdas per row.
    toks = F.array_distinct(F.split(_norm_text(F.col(text_col)), " "))
    exploded = _spread(df).select(
        F.col(id_col).alias("id"), F.explode(toks).alias("t")
    ).select("id", F.xxhash64("t").alias("h"))
    aggs = _expr_cached("simhash_aggs", (), lambda: [
        F.count("*").alias("n")
    ] + [
        F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1))).alias(f"b{b}")
        for b in range(64)
    ])

    def _build_packed():
        packed = F.lit(0).cast("long")
        for b in range(64):
            bit = (
                F.when(F.col(f"b{b}") * 2 > F.col("n"), F.lit(1).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            )
            packed = packed.bitwiseOR(F.shiftleft(bit, b))
        return packed.alias("simhash")

    counts = exploded.groupBy("id").agg(*aggs)
    return counts.select("id", _expr_cached("simhash_pack", (), _build_packed))


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
    ).select("id", "simhash", "bb.band", "bb.bucket").localCheckpoint(eager=False)
    # shuffled sort-merge self-join on (band, bucket): hot buckets generate
    # quadratic pair counts, and AQE's skew-join splitting only parallelizes
    # shuffle joins — a broadcast join would compute every pair in however
    # few partitions the probe side has
    a, b = banded.hint("merge").alias("a"), banded.alias("b")
    # hamming filter runs map-side on the raw (quadratic-in-bucket) pair
    # stream; only survivors reach the dedup shuffle
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", "hamming")
    )


def window_hashes(
    docs: DataFrame,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Every length-``n`` sliding window of whitespace tokens, as
    (id, pos, h): pos is the 1-based start token, h a 64-bit hash of the
    window's tokens joined on an unprintable separator. The exploded
    relation that backs substring-level dedup (Lee et al. 2021,
    arXiv:2107.06499 — their suffix-array pass; overlapping fixed-width
    windows are the shuffle-friendly equivalent for a fixed minimum
    match length).

    Scale: one narrow pass — windows are built per-row with
    transform+slice (O(len·n) character work, no shuffle) and exploded;
    nothing materializes driver-side. Hashing shrinks shuffle bytes to
    12/row downstream; 64-bit collisions at corpus scale are ~1 pair
    per 2^32 distinct windows and only ever over-merge a span."""
    ws = F.split(F.col(text_col), " ")
    t = _spread(docs.select(F.col(id_col).alias("id"), ws.alias("__ws")))
    nwin = F.size("__ws") - (n - 1)
    # sequence(1, stop) runs DESCENDING for stop < 1 ([1, 0] — and
    # slice(.., 0, n) then throws), so docs shorter than n tokens get an
    # explicitly empty window list
    starts = F.when(nwin >= 1, F.sequence(F.lit(1), nwin)).otherwise(
        F.array().cast("array<int>")
    )
    wins = F.transform(
        starts,
        lambda i: F.xxhash64(F.concat_ws("\x1f", F.slice(F.col("__ws"), i, n))),
    )
    return t.select("id", F.posexplode(wins).alias("__p0", "h")).select(
        "id", (F.col("__p0") + 1).alias("pos"), "h"
    )


def duplicate_spans(
    docs: DataFrame,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal cross-document duplicated substrings: every span of >= n
    consecutive tokens that appears verbatim in at least one OTHER
    document, merged to maximal extent. Returns one row per span:
    (id, span_start, span_end, span_tokens) in token coordinates —
    the exact-substring layer of training-data dedup (Lee et al. 2021
    §3: duplicate text segments removed at the span, not document,
    level; crux has no analogue — this is pipeline-native).

    Plan shape at scale: window build is narrow; ONE shuffle groups
    windows by hash for the cross-doc test (partial count-distinct
    map-side); the survivors join back on h (co-partitioned with the
    agg — exchange reuse); one shuffle on id for the per-doc interval
    union. Interval union is gaps-and-islands: a duplicated window at
    pos covers tokens [pos, pos+n-1]; a new island starts where pos
    exceeds the running max end + 1. No driver state, no quadratic
    pair expansion — a window shared by k docs costs k rows, not k^2
    pairs."""
    wins = window_hashes(docs, n=n, id_col=id_col, text_col=text_col)
    dup = (
        wins.groupBy("h")
        .agg(F.count_distinct("id").alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("h")
    )
    dwin = wins.join(dup, "h").select("id", "pos")
    w = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dwin.withColumn(
        "__new",
        F.when(
            F.col("pos")
            > F.coalesce(F.max(F.col("pos") + (n - 1)).over(w), F.lit(-1)) + 1,
            1,
        ).otherwise(0),
    )
    isl = flagged.withColumn(
        "__isl",
        F.sum("__new").over(
            Window.partitionBy("id")
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        isl.groupBy("id", "__isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (n - 1)).alias("span_end"),
        )
        .select(
            F.col("id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def duplicate_span_stats(
    docs: DataFrame,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document rollup of duplicate_spans: (doc_id, n_spans,
    dup_tokens, n_tokens, dup_frac) for every document that contains at
    least one cross-document duplicated >=n-token span. The triage view
    a pipeline filters or trims on before the expensive cut-and-rejoin
    rewrite."""
    spans = duplicate_spans(docs, n=n, id_col=id_col, text_col=text_col)
    ntok = docs.select(
        F.col(id_col), F.size(F.split(F.col(text_col), " ")).alias("n_tokens")
    )
    return (
        spans.groupBy(id_col)
        .agg(
            F.count("*").alias("n_spans"),
            F.sum("span_tokens").alias("dup_tokens"),
        )
        .join(ntok, id_col)
        .select(
            id_col,
            "n_spans",
            "dup_tokens",
            "n_tokens",
            F.round(F.col("dup_tokens") / F.col("n_tokens"), 6).alias("dup_frac"),
        )
    )


def trim_duplicate_spans(
    docs: DataFrame,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The cut step of span-level dedup (Lee et al. 2021 §4: remove
    every duplicated occurrence but one): for each duplicated window the
    corpus-first occurrence — lexicographically smallest (doc, pos) —
    WINS and is kept; every other occurrence is cut. Cut windows merge
    to maximal intervals per doc (same gaps-and-islands as
    duplicate_spans) and the surviving tokens reassemble in order.
    Returns (id_col, clean_text, n_tokens, kept_tokens) for EVERY
    document (unaffected docs pass through verbatim; a fully-cut doc
    keeps clean_text='').

    Plan shape: windows are narrow; one shuffle on h decides both
    cross-doc-ness and the winner (a single min_by struct agg — no
    window function over the full stream); join-back on h is
    co-partitioned; one shuffle on id for interval union + reassembly.
    The winner rule is a pure function of the corpus, so reruns and
    resharded clusters cut the SAME tokens."""
    wins = window_hashes(docs, n=n, id_col=id_col, text_col=text_col)
    winner = (
        wins.groupBy("h")
        .agg(
            F.count_distinct("id").alias("ndocs"),
            F.min(F.struct("id", "pos")).alias("w"),
        )
        .filter(F.col("ndocs") >= 2)
        .select("h", F.col("w.id").alias("wid"), F.col("w.pos").alias("wpos"))
    )
    cut = wins.join(winner, "h").filter(
        (F.col("id") != F.col("wid")) | (F.col("pos") != F.col("wpos"))
    ).select("id", "pos").dropDuplicates(["id", "pos"])
    w_hist = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = (
        cut.withColumn(
            "__new",
            F.when(
                F.col("pos")
                > F.coalesce(F.max(F.col("pos") + (n - 1)).over(w_hist), F.lit(-1))
                + 1,
                1,
            ).otherwise(0),
        )
        .withColumn(
            "__isl",
            F.sum("__new").over(
                Window.partitionBy("id")
                .orderBy("pos")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("id", "__isl")
        .agg(
            F.min("pos").alias("s"),
            (F.max("pos") + (n - 1)).alias("e"),
        )
        .groupBy("id")
        .agg(F.collect_list(F.struct("s", "e")).alias("__cuts"))
    )
    ws = F.split(F.col(text_col), " ")
    # r16: spread the reassembly side too — the per-row filter+concat
    # below is CPU-heavy per row, and a single-split corpus file
    # otherwise runs it in one task (window_hashes above already
    # spreads its own scan)
    base = _spread(docs).select(F.col(id_col), ws.alias("__ws"))
    joined = base.join(isl.withColumnRenamed("id", id_col), id_col, "left")
    cuts = F.coalesce(
        F.col("__cuts"), F.array().cast("array<struct<s:int,e:int>>")
    )
    # per-row array filter: token at 1-based position i survives unless
    # some cut interval covers i — intervals per doc are few (they are
    # maximal and disjoint), so this is cheap JVM-side work, no extra
    # shuffle for reassembly
    kept = F.filter(
        F.transform(
            F.col("__ws"), lambda t, i: F.struct((i + 1).alias("p"), t.alias("t"))
        ),
        lambda s: ~F.exists(
            cuts, lambda c: (s["p"] >= c["s"]) & (s["p"] <= c["e"])
        ),
    )
    return joined.select(
        F.col(id_col),
        F.concat_ws(" ", F.transform(kept, lambda s: s["t"])).alias("clean_text"),
        F.size("__ws").alias("n_tokens"),
        F.size(kept).alias("kept_tokens"),
    )


# --- Cross-document line-level dedup (RefinedWeb / MassiveText style) --


def _line_relation(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    sep: str,
    min_chars: int,
) -> DataFrame:
    """(id, idx, line, __norm, __eligible): every physical line of every
    document with its 1-based index. __norm is the dedup key
    (whitespace-trimmed); lines shorter than ``min_chars`` after trimming
    are ineligible for dedup (blank separators and one-char bullets
    shouldn't glue unrelated documents together)."""
    lines = F.split(F.col(text_col), sep, -1)
    # r16: spread before the split+explode — line splitting (and any
    # upstream per-row rewrap expression the caller stacked on
    # text_col) is per-row CPU that a single-split corpus file would
    # otherwise run in one task
    t = _spread(docs).select(
        F.col(id_col).alias("id"),
        F.posexplode(lines).alias("__p0", "line"),
    ).select("id", (F.col("__p0") + 1).alias("idx"), "line")
    norm = F.trim(F.col("line"))
    return t.select(
        "id",
        "idx",
        "line",
        norm.alias("__norm"),
        (F.length(norm) >= min_chars).alias("__eligible"),
    )


def duplicate_lines(
    docs: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """Lines repeated verbatim across documents: the triage view of
    line-level dedup (RefinedWeb, Penedo et al. 2023 §3.3 — boilerplate
    headers/footers/navigation repeat across pages of a site; MassiveText
    removes them before document-level dedup). Returns one row per
    duplicated line: (line, n_docs, n_occurrences), lines trimmed for
    comparison, ordered nowhere (set semantics).

    Scale: one narrow split+explode, ONE shuffle keyed by the line text
    (map-side partial count + count-distinct) — a line shared by k docs
    costs k rows, never k^2 pairs."""
    rel = _line_relation(docs, id_col, text_col, sep, min_chars).filter(
        "__eligible"
    )
    return (
        rel.groupBy("__norm")
        .agg(
            F.count_distinct("id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select(F.col("__norm").alias("line"), "n_docs", "n_occurrences")
    )


def trim_duplicate_lines(
    docs: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_chars: int = 1,
    mode: str = "keep_first",
) -> DataFrame:
    """Remove cross-document duplicated lines and reassemble each
    document (the line-granularity sibling of trim_duplicate_spans).
    ``mode='keep_first'`` keeps the corpus-first occurrence —
    lexicographically smallest (doc, idx) — and cuts every other
    occurrence (Lee et al. 2021 keep-one semantics); ``mode='drop_all'``
    cuts every occurrence (RefinedWeb's boilerplate removal: a line
    repeated across >= min_docs documents is navigation/chrome and no
    copy is worth keeping). Returns (id_col, clean_text, n_lines,
    kept_lines) for EVERY document; untouched docs pass through
    verbatim (original spacing inside lines preserved — only whole
    lines are removed).

    Plan shape: split+explode is narrow; one shuffle on the trimmed
    line decides cross-doc-ness and the winner in a single min_by
    struct agg (no global window); join-back on the same key is
    co-partitioned (exchange reuse); one shuffle on id collects each
    doc's cut indexes; reassembly is a per-row array filter — no extra
    shuffle. Deterministic: the winner is a pure function of the
    corpus, so reruns cut the SAME lines."""
    if mode not in ("keep_first", "drop_all"):
        raise ValueError(f"mode must be keep_first or drop_all, got {mode!r}")
    rel = _line_relation(docs, id_col, text_col, sep, min_chars)
    elig = rel.filter("__eligible")
    dup = (
        elig.groupBy("__norm")
        .agg(
            F.count_distinct("id").alias("__nd"),
            F.min(F.struct("id", "idx")).alias("__w"),
        )
        .filter(F.col("__nd") >= min_docs)
        .select(
            "__norm",
            F.col("__w.id").alias("__wid"),
            F.col("__w.idx").alias("__widx"),
        )
    )
    cut = elig.join(dup, "__norm")
    if mode == "keep_first":
        cut = cut.filter(
            (F.col("id") != F.col("__wid")) | (F.col("idx") != F.col("__widx"))
        )
    cuts = cut.groupBy("id").agg(F.collect_list("idx").alias("__cuts"))
    lines = F.split(F.col(text_col), sep, -1)
    # r16: same spread as trim_duplicate_spans' reassembly side
    base = _spread(docs).select(F.col(id_col), lines.alias("__ls"))
    joined = base.join(
        cuts.withColumnRenamed("id", id_col), id_col, "left"
    ).withColumn(
        "__cuts", F.coalesce(F.col("__cuts"), F.array().cast("array<int>"))
    )
    kept = F.filter(
        F.transform(
            F.col("__ls"), lambda l, i: F.struct((i + 1).alias("p"), l.alias("l"))
        ),
        lambda s: ~F.array_contains(F.col("__cuts"), s["p"]),
    )
    return joined.select(
        F.col(id_col),
        F.concat_ws(sep, F.transform(kept, lambda s: s["l"])).alias(
            "clean_text"
        ),
        F.size("__ls").alias("n_lines"),
        F.size(kept).alias("kept_lines"),
    )


class IncrementalMinHashIndex:
    """MinHash-LSH near-dup index maintained incrementally from document
    batches — the STREAMING sibling of :func:`minhash_lsh_pairs`, and
    the near-dup counterpart of the exact streaming dedup (the reference
    has only tx-time exact match; this is part of the pipeline-operator
    extension family, like IncrementalVectorIndex / IncrementalTextIndex
    which follow the reference's register-index! replay seam,
    crux-core/src/crux/tx.clj).

    State is the banded-signature postings table (id, sig, band, bucket)
    — one row per LSH posting, exactly the relation
    :func:`banded_signatures` calls "the persistable incremental LSH
    index" — plus (in exact mode) the shingle sets used for
    verification. Each ``add_batch``:

      1. shingles + signs the NEW docs only (one projection, no
         full-corpus pass);
      2. joins new postings against new+existing postings on
         (band, bucket) — candidate generation stays a bucket equi-join
         at any corpus size, the same shuffle shape as the batch
         operator;
      3. verifies candidates (exact shingle-set Jaccard, or signature
         agreement in ``verify="est"`` mode) and RETURNS the pairs that
         involve at least one new doc;
      4. merges the new postings/sets in by id (left-anti + union, the
         tx-batch merge shape of IncrementalVectorIndex).

    Invariant (pytest-pinned): the union of add_batch outputs over any
    partition of a corpus equals the batch ``minhash_lsh_pairs`` output
    on the whole corpus — each qualifying pair is emitted exactly once,
    in the batch where its LATER member arrived. Re-putting an id
    replaces its postings and re-evaluates its pairs (documented: the
    pair re-emits against the new text).

    100 TB posture: postings are ~bands rows/doc and partition by
    (band, bucket); the exact-mode shingle-set table is the verification
    cost the batch operator pays too — drop to ``verify="est"`` where
    storing sets is not worth signature-only precision. No driver-side
    state.

    Checkpointable through CheckpointStore's ``indexes=`` seam like the
    other incremental indexes: save() writes postings (partitioned by
    band) + sets + params; load() localCheckpoints so restores survive
    deletion of the source checkpoint dir.
    """

    def __init__(self, spark, n: int = 3, num_hashes: int = 32,
                 bands: int = 16, threshold: float = 0.5,
                 verify: str = "exact", hash_fn=None,
                 checkpoint_every: int = 8):
        if num_hashes % bands:
            raise ValueError("num_hashes must be divisible by bands")
        if verify not in ("exact", "est"):
            raise ValueError(f"unknown verify mode {verify!r}")
        self.spark = spark
        self.hash_fn = hash_fn  # None = xxhash64; see shingle_hashes
        self.n = n
        self.num_hashes = num_hashes
        self.bands = bands
        self.threshold = threshold
        self.verify = verify
        self.postings: DataFrame | None = None  # id, sig, band, bucket
        self.sets: DataFrame | None = None      # id, sh (exact mode)
        self.last_tx_id: int = -1
        # Lineage bound (r13 verdict watch item): the per-batch state
        # merge chains LAZY localCheckpoints — cheap, but over a long
        # listener stream the unmaterialized plan between eager points
        # grows linearly with batch count. Every `checkpoint_every`-th
        # batch the merge materializes EAGERLY, resetting lineage depth
        # to O(1); <=0 disables the cadence (every merge stays lazy).
        self.checkpoint_every = checkpoint_every
        self._batches_since_eager = 0

    def add_batch(self, docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
        """Index a batch of documents; return the near-dup pairs this
        batch creates: (id_a, id_b, jaccard|est_jaccard) with every pair
        involving >=1 doc from this batch, ordered id_a < id_b."""
        self._batches_since_eager += 1
        eager_merge = (self.checkpoint_every > 0
                       and self._batches_since_eager >= self.checkpoint_every)
        if eager_merge:
            self._batches_since_eager = 0
        ex = shingle_hashes(docs, id_col, text_col, self.n,
                            hash_fn=self.hash_fn)
        # exact mode: ONE fused per-doc aggregation yields signature +
        # shingle set — replaces three checkpointed frames (exploded,
        # sigs, new_sets) with one, cutting the per-batch synchronous
        # Catalyst planning cost (the dominant add_batch cost at bench
        # scale: ~6 planning passes x 0.2-0.6s) in half while keeping
        # the same single-computation guarantees.
        per_doc = None
        if self.verify == "exact":
            per_doc = _per_doc_sig_sets(
                ex, self.num_hashes
            ).localCheckpoint(eager=False)
            sigs = per_doc.select("id", "sig")
        else:
            sigs = minhash_signatures(
                docs, id_col, text_col, self.n, self.num_hashes,
                exploded=ex, checkpoint=False,  # new_banded ckpt'd below
            )
        # lazy checkpoint (r15 optimization): the batch's banded postings
        # feed the candidate join AND the state merge, so the checkpoint
        # guarantees one computation — but materializing EAGERLY here ran
        # a synchronous job per batch before any consumer needed it.
        # Lazy keeps the single-computation guarantee (first consumer
        # materializes, later ones read the cached blocks) while letting
        # the whole batch pipeline run as one job. Lineage stays bounded:
        # the checkpoint truncates the logical plan either way, and the
        # state-merge cadence (checkpoint_every) still forces eager
        # materialization of the ACCUMULATED state.
        # r16: in EXACT mode the banding explode is a narrow map over
        # the checkpointed per_doc frame, so checkpointing it again only
        # paid another synchronous physical-planning pass per batch
        # (measured ~0.5-1s each, the dominant add_batch cost at bench
        # scale); consumers re-run the cheap explode from per_doc's
        # cached blocks instead. Est mode keeps the checkpoint — there
        # new_banded is the batch's ONLY plan-truncation point.
        new_banded = banded_signatures(sigs, self.num_hashes, self.bands)
        if per_doc is None:
            new_banded = new_banded.localCheckpoint(eager=False)
        # exact mode: per_doc is already one checkpointed row per doc —
        # its id column IS the touched set, no distinct shuffle needed
        # in the consuming left-anti merges (est mode keeps the distinct
        # over the checkpointed postings)
        touched = (per_doc.select("id") if per_doc is not None
                   else new_banded.select("id").distinct())

        # candidate generation: new x (existing + new). Half-open on the
        # NEW side only — cross pairs take both orders in the raw join,
        # so normalize to (min, max); in-batch pairs use a.id < b.id
        # directly like the batch operator.
        a = new_banded.alias("a")
        inb = a.join(
            new_banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b"),
        )
        if self.postings is not None:
            old = self.postings.join(touched, "id", "left_anti").alias("o")
            cross = a.join(
                old,
                (F.col("a.band") == F.col("o.band"))
                & (F.col("a.bucket") == F.col("o.bucket")),
            ).select(
                F.least(F.col("a.id"), F.col("o.id")).alias("id_a"),
                F.greatest(F.col("a.id"), F.col("o.id")).alias("id_b"),
                F.when(F.col("a.id") < F.col("o.id"), F.col("a.sig"))
                .otherwise(F.col("o.sig")).alias("sig_a"),
                F.when(F.col("a.id") < F.col("o.id"), F.col("o.sig"))
                .otherwise(F.col("a.sig")).alias("sig_b"),
            )
            cands = inb.unionByName(cross)
        else:
            cands = inb

        if self.verify == "exact":
            pairs = cands.select("id_a", "id_b").dropDuplicates(
                ["id_a", "id_b"]
            )
            new_sets = per_doc.select("id", "sh")
            # one checkpoint serves BOTH the verify join (which reads
            # all_sets twice) and the accumulated state — previously the
            # verify read the unmaterialized merge (left-anti computed
            # twice at exec) and the state checkpointed it again.
            if self.sets is not None:
                all_sets = self.sets.join(
                    touched, "id", "left_anti"
                ).unionByName(new_sets).localCheckpoint(eager=eager_merge)
            else:
                all_sets = new_sets
            sa = all_sets.select(F.col("id").alias("id_a"),
                                 F.col("sh").alias("sh_a"))
            sb = all_sets.select(F.col("id").alias("id_b"),
                                 F.col("sh").alias("sh_b"))
            n_inter = F.size(F.array_intersect("sh_a", "sh_b"))
            out = (
                pairs.join(sa, "id_a").join(sb, "id_b")
                .withColumn(
                    "jaccard",
                    F.round(
                        n_inter
                        / (F.size("sh_a") + F.size("sh_b") - n_inter), 6
                    ),
                )
                .filter(F.col("jaccard") >= self.threshold)
                .select("id_a", "id_b", "jaccard")
            )
            self.sets = all_sets
        else:
            agree = F.size(F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            ))
            out = (
                cands.withColumn(
                    "est_jaccard", F.round(agree / F.lit(self.num_hashes), 6)
                )
                .filter(F.col("est_jaccard") >= self.threshold)
                .dropDuplicates(["id_a", "id_b"])
                .select("id_a", "id_b", "est_jaccard")
            )

        if self.postings is None:
            self.postings = new_banded
        else:
            self.postings = (
                self.postings.join(touched, "id", "left_anti")
                .unionByName(new_banded)
                .localCheckpoint(eager=eager_merge)
            )
        return out

    def listener(self, epoch_id: int, ops_batch: DataFrame,
                 text_field: str = "text",
                 max_tx: int | None = None) -> DataFrame:
        """tx-log form (register-index! seam): extract each entity's
        final put doc text from the batch and index it. Deletes/evicts
        drop the entity's postings (its pairs stop being emitted against
        future docs).

        CONTRACT: state merges chain LAZY localCheckpoints, so
        ``ops_batch`` must stay recomputable until ``checkpoint_every``
        batches later (TxLogStream pins each batch to executor blocks
        before dispatch; direct callers must pass a re-readable frame or
        set checkpoint_every=1)."""
        eff = ops_batch.filter(F.col("op").isin("put", "delete", "evict"))
        last = eff.groupBy("eid").agg(
            F.max_by(
                F.struct("op", "doc_json"), F.struct("tx_id", "seq")
            ).alias("last")
        )
        puts = (
            last.filter(F.col("last.op") == "put")
            .select(
                F.col("eid").alias("doc_id"),
                F.get_json_object(
                    "last.doc_json", f"$.{text_field}"
                ).alias("text"),
            )
            .filter(F.col("text").isNotNull())
        )
        gone = last.filter(F.col("last.op") != "put").select(
            F.col("eid").alias("id")
        )
        if self.postings is not None:
            self.postings = self.postings.join(
                gone, "id", "left_anti"
            ).localCheckpoint(eager=False)
        if self.sets is not None:
            self.sets = self.sets.join(
                gone, "id", "left_anti"
            ).localCheckpoint(eager=False)
        out = self.add_batch(puts)
        # `max_tx` lets the commit/ingest path hand down the batch max it
        # already knows; without it the watermark costs an extra pass.
        if max_tx is None:
            mx = ops_batch.agg(F.max("tx_id")).first()[0]
            max_tx = int(mx) if mx is not None else None
        if max_tx is not None:
            self.last_tx_id = max(self.last_tx_id, int(max_tx))
        return out

    # -- checkpoint persistence (same contract as the other indexes) --
    def save(self, path: str) -> None:
        import json as _json
        import os as _os

        _os.makedirs(path, exist_ok=True)
        if self.postings is not None:
            self.postings.write.mode("overwrite").partitionBy(
                "band"
            ).parquet(_os.path.join(path, "postings"))
        if self.sets is not None:
            self.sets.write.mode("overwrite").parquet(
                _os.path.join(path, "sets")
            )
        with open(_os.path.join(path, "index.json"), "w") as f:
            _json.dump(
                {"n": self.n, "num_hashes": self.num_hashes,
                 "bands": self.bands, "threshold": self.threshold,
                 "verify": self.verify, "last_tx_id": self.last_tx_id},
                f,
            )

    @classmethod
    def load(cls, spark, path: str) -> "IncrementalMinHashIndex":
        import json as _json
        import os as _os

        with open(_os.path.join(path, "index.json")) as f:
            meta = _json.load(f)
        idx = cls(spark, n=meta["n"], num_hashes=meta["num_hashes"],
                  bands=meta["bands"], threshold=meta["threshold"],
                  verify=meta["verify"])
        idx.last_tx_id = int(meta.get("last_tx_id", -1))
        pd_dir = _os.path.join(path, "postings")
        if _os.path.isdir(pd_dir):
            # localCheckpoint: restores must survive deletion of the
            # source checkpoint dir (r12 advice)
            idx.postings = spark.read.parquet(pd_dir).localCheckpoint()
        sd = _os.path.join(path, "sets")
        if _os.path.isdir(sd):
            idx.sets = spark.read.parquet(sd).localCheckpoint()
        return idx
