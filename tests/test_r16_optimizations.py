"""Focused pins for the r16 optimization-round internals changes:

- ``parse_byte_size`` must accept every Spark-style size form (plain
  bytes, "128b", "128m", "64MB", "1g") — the r15 form silently disabled
  the skip-repartition optimization under human-readable configs.
- ``input_size_bytes`` must size a path through the Hadoop FileSystem
  API (cluster-safe) and agree with the local-disk walk for file:// /
  bare local paths; a missing path degrades to 0, never raises.
- ``gateway_token`` must be stable while the gateway object is alive
  (expression caches keep hitting) and must NOT alias a different
  gateway object even if CPython reuses the old object's id.
- ``TxStore._tx_id`` lazy seeding: a versions frame handed WHOLESALE to
  the public constructor must not let a subsequent ``submit_tx`` reuse
  existing tx ids (bulk_ingest no longer self-heals this with a
  post-merge max aggregate).
"""

import os

from pyspark.sql import functions as F


def test_parse_byte_size_forms():
    from crux_spark._conf import parse_byte_size

    d = 128 << 20
    assert parse_byte_size(None, d) == d
    assert parse_byte_size("134217728", d) == 134217728
    assert parse_byte_size("134217728b", d) == 134217728
    assert parse_byte_size("128m", d) == 128 << 20
    assert parse_byte_size("128MB", d) == 128 << 20
    assert parse_byte_size("64k", d) == 64 << 10
    assert parse_byte_size("1g", d) == 1 << 30
    assert parse_byte_size("2t", d) == 2 << 40
    assert parse_byte_size(" 256 m ", d) == 256 << 20
    assert parse_byte_size(134217728, d) == 134217728
    # malformed -> default, never raises
    assert parse_byte_size("lots", d) == d
    assert parse_byte_size("12.5m", d) == d
    assert parse_byte_size("", d) == d


def test_input_size_bytes_local_and_scheme(spark, tmp_path):
    from crux_spark._conf import input_size_bytes

    p = tmp_path / "data"
    p.mkdir()
    (p / "a.bin").write_bytes(b"x" * 1000)
    sub = p / "sub"
    sub.mkdir()
    (sub / "b.bin").write_bytes(b"y" * 2345)
    walk = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(p)
        for f in fs
    )
    assert walk == 3345
    # bare local path and an explicit scheme (the non-local form the
    # Hadoop FS resolves itself) must both agree with the walk
    assert input_size_bytes(spark, str(p)) == walk
    assert input_size_bytes(spark, "file://" + str(p)) == walk
    # missing path -> 0, never raises (callers floor at source splits)
    assert input_size_bytes(spark, str(p / "nope")) == 0


def test_gateway_token_stable_and_alias_proof(spark):
    from crux_spark import _jvmcache
    from crux_spark._jvmcache import gateway_token

    t1 = gateway_token()
    t2 = gateway_token()
    assert t1 == t2  # stable while the gateway lives -> caches hit

    # simulate an id()-reusing gateway swap: point the weakref at a
    # DIFFERENT object and confirm the token bumps even though the
    # id of the real gateway never changed
    class _Fake:
        pass

    fake = _Fake()
    import weakref

    old_ref, old_tok = _jvmcache._GW_REF, _jvmcache._GW_TOKEN
    try:
        _jvmcache._GW_REF = weakref.ref(fake)
        t3 = gateway_token()
        assert t3 > t2
        assert gateway_token() == t3
    finally:
        _jvmcache._GW_REF, _jvmcache._GW_TOKEN = old_ref, old_tok


def test_txstore_constructor_seeds_tx_id_lazily(spark):
    from crux_spark.bitemporal.store import TxStore

    base = TxStore(spark)
    base.submit_tx([("put", {"id": "e1", "v": 1}), ("put", {"id": "e2", "v": 2})])
    base.submit_tx([("put", {"id": "e1", "v": 3})])
    base.commit()
    versions = base.versions
    max_tx = versions.agg(F.max("tx_from")).first()[0]
    assert max_tx >= 2

    # hand the versions frame WHOLESALE to the public constructor
    st = TxStore(spark, versions=versions)
    assert not st._tx_seeded  # no aggregate ran at construction
    tx_id = st.submit_tx([("put", {"id": "e3", "v": 9})])
    # the new tx id must be strictly past every existing tx_from
    assert tx_id > max_tx
    st.commit()
    n = st.versions.where(F.col("tx_from") == tx_id).count()
    assert n >= 1
    # and the lazy seed ran (seeded flag set, counter past the max)
    assert st._tx_seeded
    assert st._tx_id >= tx_id


# ---------------------------------------------------------------------------
# r16: append-splice closed form — commits of all-unranged-put batches
# into a NON-empty store route through _append_splice (JVM-only) when
# every touched entity's current belief can only overlap its open tail
# row; everything else falls back to the cogroup. Row-identity matrix
# mirrors test_commit_fast_path_equivalence (940ad54).
# ---------------------------------------------------------------------------

def _mk_pair(spark):
    """(fast, slow) stores with identical state; slow is pinned to the
    cogroup by disabling the shape check on the instance."""
    from crux_spark.bitemporal.store import TxStore

    fast, slow = TxStore(spark), TxStore(spark)
    # force the splice on `fast` regardless of store size (the size
    # router keeps small stores on the cogroup); pin `slow` to the
    # cogroup by disabling the shape check on the instance.
    fast._append_splice_worthwhile = lambda: True
    slow._commit_fast_path_ok = lambda: False
    return fast, slow


def _versions_set(store):
    from crux_spark.bitemporal.store import VERSIONS_SCHEMA

    cols = [f.name for f in VERSIONS_SCHEMA.fields]
    return sorted(tuple(r) for r in store.versions.select(*cols).collect())


def _spy_append(store, calls):
    orig = store._append_splice

    def spy(ops_eff):
        out = orig(ops_eff)
        calls.append(out is not None)
        return out

    store._append_splice = spy


def test_commit_append_splice_equivalence(spark):
    import datetime as dt

    ts = lambda s: dt.datetime(2024, 5, 1, 0, 0, s, tzinfo=dt.timezone.utc)
    fast, slow = _mk_pair(spark)
    calls: list[bool] = []
    _spy_append(fast, calls)

    # round 1: fresh store (empty-store closed form on fast)
    for st in (fast, slow):
        for j in range(4):
            st.submit_tx([("put", {"id": f"e{j}", "v": j})], tx_time=ts(1 + j))
        assert st.commit() == set()
    assert calls == []  # empty-store path, not the append splice

    # round 2: re-put every existing entity later (sorted_maps shape),
    # plus brand-new entities in the same batch (mixed fresh+append)
    for st in (fast, slow):
        for j in range(4):
            st.submit_tx([("put", {"id": f"e{j}", "v": 100 + j})],
                         tx_time=ts(20 + j))
        st.submit_tx([("put", {"id": "n1", "v": -1})], tx_time=ts(25))
        assert st.commit() == set()
    assert calls == [True]
    assert _versions_set(fast) == _versions_set(slow)

    # round 3: multiple appends per entity in ONE batch (explicit vfs,
    # strictly increasing)
    for st in (fast, slow):
        for k in range(3):
            st.submit_tx(
                [("put", {"id": "e0", "v": 200 + k}, ts(40 + k))],
                tx_time=ts(30 + k),
            )
        assert st.commit() == set()
    assert calls == [True, True]
    assert _versions_set(fast) == _versions_set(slow)


def test_commit_append_splice_tombstone_and_ranged_history(spark):
    import datetime as dt

    ts = lambda s: dt.datetime(2024, 6, 1, 0, 0, s, tzinfo=dt.timezone.utc)
    fast, slow = _mk_pair(spark)
    calls: list[bool] = []
    _spy_append(fast, calls)

    for st in (fast, slow):
        # a: open tombstone tail (put then delete)
        st.submit_tx([("put", {"id": "a", "v": 1})], tx_time=ts(1))
        st.submit_tx([("delete", "a")], tx_time=ts(2))
        # b: history ends in a RANGED put — no open row at all
        st.submit_tx(
            [("put", {"id": "b", "v": 1}, ts(3), ts(5))], tx_time=ts(3)
        )
        st.commit()  # delete/ranged -> cogroup on both stores

        # append past both histories: a's tombstone tail gets clipped,
        # b has no overlapping current row (pure append)
        st.submit_tx([("put", {"id": "a", "v": 2})], tx_time=ts(10))
        st.submit_tx([("put", {"id": "b", "v": 2})], tx_time=ts(11))
        assert st.commit() == set()
    assert calls == [True]
    assert _versions_set(fast) == _versions_set(slow)

    # reads agree end-to-end too
    for vt in (ts(1), ts(4), ts(12)):
        fa = sorted(tuple(r) for r in fast.db(vt).collect())
        sl = sorted(tuple(r) for r in slow.db(vt).collect())
        assert fa == sl


def test_commit_append_splice_ineligible_overlaps(spark):
    """Batches whose first new put lands INSIDE an entity's existing
    belief (not past the open tail) must fail the probe and take the
    cogroup — results identical."""
    import datetime as dt

    ts = lambda s: dt.datetime(2024, 7, 1, 0, 0, s, tzinfo=dt.timezone.utc)
    fast, slow = _mk_pair(spark)
    calls: list[bool] = []
    _spy_append(fast, calls)

    for st in (fast, slow):
        st.submit_tx([("put", {"id": "x", "v": 1}, ts(10))], tx_time=ts(1))
        st.submit_tx([("put", {"id": "x", "v": 2}, ts(20))], tx_time=ts(2))
        st.commit()
        # put BEFORE the open tail's valid_from (20): overlaps the tail
        # remainder AND the open row -> ineligible
        st.submit_tx([("put", {"id": "x", "v": 3}, ts(15))], tx_time=ts(3))
        st.commit()
        # put exactly AT the open tail's valid_from: vf == tail vf is
        # ineligible (no remainder form)
        st.submit_tx([("put", {"id": "x", "v": 4}, ts(20))], tx_time=ts(4))
        st.commit()
    assert calls == [False, False]
    assert _versions_set(fast) == _versions_set(slow)


def test_txlog_listener_state_survives_log_pruning(spark, tmp_path):
    """r15 advice (re-readability): listener state chains lazy
    localCheckpoints, so TxLogStream must pin each micro-batch to
    executor blocks BEFORE dispatch — deleting the tx-log files after
    the stream drains must not break a later index read. (On this Spark
    build DSv1 file-source batches arrive as LogicalRDD and happen to
    survive pruning even unpinned; the pin is what the CONTRACT
    guarantees — it also covers non-refetchable sources like Kafka —
    and this test pins the contract's observable outcome.)"""
    import datetime as dt
    import shutil

    from crux_spark.functions.text_search import IncrementalTextIndex
    from crux_spark.streaming.ingest import TxLogStream, write_tx_log

    log_dir = str(tmp_path / "txlog")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2023, 2, 1)
    write_tx_log(
        spark,
        log_dir,
        [
            (1, [("put", {"id": "d1", "text": "merge the sorted runs"}, t0)]),
            (2, [("put", {"id": "d2", "text": "sorted maps microbench"}, t0)]),
        ],
    )
    # large cadence -> every per-batch merge stays LAZY
    idx = IncrementalTextIndex(spark, checkpoint_every=1000)
    stream = TxLogStream(spark, log_dir)
    stream.listen(idx.listener)
    stream.start(ckpt).awaitTermination(120)
    # prune the source log entirely, then force the deferred state
    shutil.rmtree(log_dir)
    rows = idx.postings.collect()  # must not touch the pruned files
    assert {r.eid for r in rows} == {"d1", "d2"}
    assert idx.last_tx_id == 2


def test_append_splice_size_router(spark, monkeypatch):
    """auto mode routes small stores to the cogroup and large estimates
    to the splice; always/never override; failure -> cogroup."""
    from crux_spark.bitemporal.store import TxStore

    st = TxStore(spark)
    st.submit_tx([("put", {"id": "e", "v": 1})])
    st.commit()
    assert not st._append_splice_worthwhile()  # tiny store -> cogroup
    monkeypatch.setenv("CRUX_SPARK_APPEND_SPLICE", "always")
    assert st._append_splice_worthwhile()
    monkeypatch.setenv("CRUX_SPARK_APPEND_SPLICE", "never")
    assert not st._append_splice_worthwhile()
    monkeypatch.setenv("CRUX_SPARK_APPEND_SPLICE", "auto")
    monkeypatch.setenv("CRUX_SPARK_APPEND_SPLICE_MIN_BYTES", "16b")
    assert st._append_splice_worthwhile()  # threshold below the estimate
    monkeypatch.setenv("CRUX_SPARK_APPEND_SPLICE_MIN_BYTES", "1g")
    assert not st._append_splice_worthwhile()


def test_av_text_index_size_aware_persist(spark, monkeypatch, tmp_path):
    """Below the source-size threshold — and for size-less plans
    (plain createDataFrame reports Long.MaxValue = unknown) — the
    postings stay lazy (measured faster cold at bench scale); above it
    they persist so every search_av consumer shares one tokenize pass —
    identical results."""
    from crux_spark.functions.text_search import build_av_text_index, search_av

    local = spark.createDataFrame(
        [("a", "merge the sorted runs"), ("b", "sorted maps microbench")],
        "id string, body string",
    )
    pq = str(tmp_path / "docs_pq")
    local.write.parquet(pq)
    df = spark.read.parquet(pq)  # real size stats from the files

    p1, d1, n1 = build_av_text_index(df, "id", "body")
    assert p1.storageLevel.useMemory is False  # lazy below threshold

    monkeypatch.setenv("CRUX_SPARK_TEXT_INDEX_PERSIST_MIN_BYTES", "1b")
    # unknown-size plans must STAY lazy even below any threshold
    pl, _, _ = build_av_text_index(local, "id", "body")
    assert pl.storageLevel.useMemory is False
    p2, d2, n2 = build_av_text_index(df, "id", "body")
    assert p2.storageLevel.useMemory and p2.storageLevel.useDisk
    r1 = sorted(map(tuple, search_av(p1, d1, n1, "sorted").collect()))
    r2 = sorted(map(tuple, search_av(p2, d2, n2, "sorted").collect()))
    assert r1 == r2 and r1
    p2.unpersist(); d2.unpersist()


def test_ngram_jaccard_window_dfreq_matches_brute_force(spark):
    """r16: document frequency via count() OVER (PARTITION BY h) — the
    pairs (incl. exact jaccard values) must still match a brute-force
    all-pairs python computation on a corpus with hot AND rare shared
    shingles (the prefix filter must stay exact under the window-count
    global order)."""
    from itertools import combinations

    from crux_spark.operators import dedup

    texts = {
        1: "the quick brown fox jumps over the lazy dog today",
        2: "the quick brown fox jumps over the lazy cat today",
        3: "the quick brown fox leaps over the lazy dog today",
        4: "pack my box with five dozen liquor jugs now ok",
        5: "pack my box with five dozen liquor jugs now ok",
        6: "completely unrelated text goes right here alone forever",
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])

    def sh(t, n=3):
        w = t.split(" ")
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)} or {t}

    expect = {}
    for a, b in combinations(sorted(texts), 2):
        sa, sb = sh(texts[a]), sh(texts[b])
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.4:
            expect[(a, b)] = round(j, 6)

    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.4).collect()
    }
    assert got == expect


def test_bulk_ingest_empty_store_probe_skip_routing(spark):
    """r16: bulk_ingest into a provably-empty store skips the
    existing-eid join. (a) ordered ops take the closed form and match a
    per-op submit_tx store row-for-row; (b) an out-of-order valid_from
    stream must still be detected (bad > 0 with the join-less probe)
    and fall back to the splice cogroup, again matching submit_tx."""
    import datetime as dt

    from pyspark.sql import functions as F

    from crux_spark.bitemporal.store import TxStore

    def ops_df(pairs):
        # (eid, vf_us) put rows, doc {"v": vf}
        return spark.createDataFrame(
            [(e, v, {"v": v}) for e, v in pairs],
            "eid string, vf long, doc struct<v:long>",
        ).select(
            "eid",
            F.col("doc.v").alias("v"),
            F.timestamp_micros(F.col("vf")).alias("vf_ts"),
        )

    def reference(pairs):
        # bulk tx ids are the vf micros, so the per-op reference must
        # commit in vf order for the tx-rank structure to line up
        ref = TxStore(spark)
        for e, v in sorted(pairs, key=lambda p: p[1]):
            ref.submit_tx(
                [("put", {"id": e, "v": v},
                  dt.datetime.fromtimestamp(v / 1e6, dt.timezone.utc))],
                tx_time=dt.datetime.fromtimestamp(v / 1e6, dt.timezone.utc),
            )
            ref.commit()
        return ref

    def versions_key(store):
        # interval structure only: submit_tx docs carry "id" inside
        # doc_json (the put contract) while bulk doc_cols don't (hash
        # differs), and bulk tx ids are the vf micros while submit_tx
        # assigns sequential ids - compare tx values by RANK
        cols = ["eid", "valid_from", "valid_to", "tx_from", "tx_to",
                "deleted"]
        rows = [tuple(r) for r in store.versions.select(*cols).collect()]
        txs = {v: i for i, v in enumerate(
            sorted({r[3] for r in rows} | {r[4] for r in rows}))}
        return sorted(
            (r[0], r[1], r[2], txs[r[3]], txs[r[4]], r[5]) for r in rows
        )

    ordered = [("a", 1_000_000), ("a", 2_000_000), ("b", 1_500_000)]
    st = TxStore(spark)
    assert st._versions_empty
    st.bulk_ingest(ops_df(ordered), id_expr="eid", doc_cols=["v"],
                   valid_from_col="vf_ts")
    assert not st._versions_empty
    assert versions_key(st) == versions_key(reference(ordered))
    assert st._tx_id == 2_000_000

    # out-of-order per entity: valid_from decreases at equal-increasing
    # tx would be fine, but here tx_id defaults to vf micros, so a
    # DUPLICATE vf per entity violates strict ordering -> cogroup
    # strict-ordering violation (duplicate (tx, vf) per entity): the
    # join-less probe must still count it bad and route through the
    # splice cogroup (fresh=None), producing a consistent store
    disordered = [("c", 3_000_000), ("c", 3_000_000), ("d", 1_000_000)]
    st2 = TxStore(spark)
    st2.bulk_ingest(ops_df(disordered), id_expr="eid", doc_cols=["v"],
                    valid_from_col="vf_ts")
    assert st2.db().count() == 2  # one current belief per entity
    assert not st2._versions_empty


def test_decode_verification_media_matches_operator_composition(spark):
    """The fused (and spread) verification decode must equal the
    four-pass composition it replaced: synthesize blobs, run the REAL
    media_metadata + extract_features operators on each, join on
    media_id. Pins both the §9 fusion and the §19 parallelism spread
    (the spread's repartition must not change any row)."""
    from crux_spark.operators import multimodal as mm

    docs = spark.range(0, 97).withColumnRenamed("id", "doc_id")

    fused = {
        r["media_id"]: r.asDict()
        for r in mm.decode_verification_media(docs).collect()
    }

    images, wavs = mm.synthetic_verification_media(docs)
    meta_img = {r["media_id"]: r for r in mm.media_metadata(images).collect()}
    meta_wav = {r["media_id"]: r for r in mm.media_metadata(wavs).collect()}
    feat_img = {r["media_id"]: r for r in mm.extract_features(images).collect()}
    feat_wav = {r["media_id"]: r for r in mm.extract_features(wavs).collect()}

    assert set(fused) == set(range(97))
    for d in range(97):
        f = fused[d]
        assert f["width"] == meta_img[d]["width"]
        assert f["height"] == meta_img[d]["height"]
        assert f["sample_rate"] == meta_wav[d]["sample_rate"]
        # doubles must be BIT-identical: same functions, same inputs
        assert f["f0"] == feat_img[d]["features"][0]
        assert f["f1"] == feat_img[d]["features"][1]
        assert f["f2"] == feat_img[d]["features"][2]
        assert f["rms"] == feat_wav[d]["features"][1]
        assert f["peak"] == feat_wav[d]["features"][3]


def test_ngram_pairgen_size_aware_pin(spark, monkeypatch, tmp_path):
    """ngram_jaccard_pairs pins its per-doc base (localCheckpoint) only
    when the input's size estimate crosses the threshold; unknown-size
    plans (plain createDataFrame reports Long.MaxValue) stay lazy; the
    pinned and lazy forms return identical pairs."""
    from crux_spark.operators.dedup import ngram_jaccard_pairs

    rows = [
        (i, f"the quick brown fox jumps over dog {i % 7} again and again")
        for i in range(60)
    ]
    local = spark.createDataFrame(rows, "doc_id long, text string")
    pq = str(tmp_path / "docs_pq")
    local.write.parquet(pq)
    df = spark.read.parquet(pq)  # real size stats from the files

    def pinned(pairs):
        # pinned = the base (window + collect_list lineage) was replaced
        # by a checkpoint scan, so collect_list no longer appears in the
        # pair plan (a LogicalRDD scan test would false-positive on
        # createDataFrame sources, which are LogicalRDD-backed)
        plan = pairs._jdf.queryExecution().optimizedPlan().toString()
        return "collect_list" not in plan

    lazy = ngram_jaccard_pairs(df, threshold=0.4)
    assert not pinned(lazy)  # tiny corpus below the default threshold

    monkeypatch.setenv("CRUX_SPARK_PAIRGEN_PIN_MIN_BYTES", "1b")
    # unknown-size plans must STAY lazy even below any threshold
    assert not pinned(ngram_jaccard_pairs(local, threshold=0.4))
    hard = ngram_jaccard_pairs(df, threshold=0.4)
    assert pinned(hard)

    r_lazy = sorted(map(tuple, lazy.collect()))
    r_hard = sorted(map(tuple, hard.collect()))
    assert r_lazy == r_hard and r_lazy
