"""Checkpoint store (crux-core/src/crux/checkpoint.clj;
checkpoint_test.clj): frequency-gated saves, newest-first listing,
restore + WAL-tail replay, retention cleanup."""

import datetime as dt
import json

from crux_spark.bitemporal.checkpoint import CheckpointStore
from crux_spark.bitemporal.store import TxStore


def t(day):
    return dt.datetime(2022, 1, day)


def test_checkpoint_save_gate_restore(spark, tmp_path):
    cp = CheckpointStore(str(tmp_path / "cps"), approx_frequency=3600)
    store = TxStore(spark)
    store.submit_tx([("put", {"id": "a", "v": 1})], tx_time=t(1))
    store.commit()

    meta1 = cp.checkpoint(store)
    assert meta1 is not None and meta1["tx_id"] == 1

    # gated: a second call within approx_frequency is a no-op
    # (checkpoint_test.clj "doesn't do a second checkpoint within ...")
    store.submit_tx([("put", {"id": "b", "v": 2})], tx_time=t(2))
    store.commit()
    assert cp.checkpoint(store) is None
    assert [m["tx_id"] for m in cp.available_checkpoints()] == [1]

    # force bypasses the gate
    meta2 = cp.checkpoint(store, force=True)
    assert meta2["tx_id"] == 2
    assert [m["tx_id"] for m in cp.available_checkpoints()] == [2, 1]

    restored = cp.restore_latest(spark)
    assert restored.latest_completed_tx() == 2
    assert restored.entity("b")["v"] == 2
    assert restored.entity("a")["v"] == 1


def test_checkpoint_skips_when_no_new_txs(spark, tmp_path):
    cp = CheckpointStore(str(tmp_path / "cps"), approx_frequency=0.0)
    store = TxStore(spark)
    store.submit_tx([("put", {"id": "a", "v": 1})])
    store.commit()
    assert cp.checkpoint(store) is not None
    # frequency elapsed (0s) but no new txs -> still a no-op
    assert cp.checkpoint(store) is None


def test_restore_replays_wal_tail(spark, tmp_path):
    wal = str(tmp_path / "wal.jsonl")
    cp = CheckpointStore(str(tmp_path / "cps"))
    store = TxStore(spark, wal_path=wal)
    store.submit_tx([("put", {"id": "a", "v": 1})], tx_time=t(1))
    store.commit()
    assert cp.checkpoint(store)["tx_id"] == 1

    # txs AFTER the checkpoint land only in the WAL
    store.submit_tx([("put", {"id": "a", "v": 9})], tx_time=t(5))
    store.submit_tx([("put", {"id": "c", "v": 3})], tx_time=t(6))
    store.commit()

    restored = cp.restore_latest(spark, wal_path=wal)
    assert restored.latest_completed_tx() == 3
    assert restored.entity("a")["v"] == 9
    assert restored.entity("c")["v"] == 3
    # bitemporal history survives the checkpoint+replay seam
    assert restored.entity("a", valid_time=t(2))["v"] == 1


def test_cleanup_retention(spark, tmp_path):
    cp = CheckpointStore(str(tmp_path / "cps"), approx_frequency=0.0)
    store = TxStore(spark)
    for i in range(4):
        store.submit_tx([("put", {"id": "x", "v": i})], tx_time=t(i + 1))
        store.commit()
        assert cp.checkpoint(store, force=True) is not None
    assert len(cp.available_checkpoints()) == 4
    removed = cp.cleanup(keep=2)
    assert len(removed) == 2
    kept = [m["tx_id"] for m in cp.available_checkpoints()]
    assert kept == [4, 3]
    # the newest survivor still restores
    assert cp.restore_latest(spark).entity("x")["v"] == 3


def test_restore_after_trailing_abort_does_not_reuse_tx_id(spark, tmp_path):
    """A trailing match-aborted tx still occupies its id slot: the
    restored node must not re-issue it (the versions table alone cannot
    show it — aborted txs index nothing), or the next submit writes a
    DUPLICATE tx_id into the durable WAL and a later recover silently
    drops the committed put."""
    wal = str(tmp_path / "wal.jsonl")
    cp = CheckpointStore(str(tmp_path / "cps"))
    store = TxStore(spark, wal_path=wal)
    store.submit_tx([("put", {"id": "a", "v": 1})], tx_time=t(1))
    store.commit()
    # tx 2: failed match -> aborted, but the id is spent
    store.submit_tx(
        [("match", "a", {"id": "a", "v": 999}), ("put", {"id": "a", "v": 2})],
        tx_time=t(2),
    )
    assert store.commit() == {2}
    meta = cp.checkpoint(store)
    assert meta["tx_id"] == 2

    restored = cp.restore_latest(spark, wal_path=wal)
    tx3 = restored.submit_tx([("put", {"id": "b", "v": 3})], tx_time=t(3))
    assert tx3 == 3  # NOT a reuse of the aborted id 2
    restored.commit()

    # the WAL replays cleanly: b's put survives, a's aborted put doesn't
    rec = TxStore.recover(spark, wal)
    assert rec.entity("b", valid_time=t(4))["v"] == 3
    assert rec.entity("a", valid_time=t(4))["v"] == 1


def test_restore_preserves_pre_checkpoint_aborts(spark, tmp_path):
    """tx_committed on a restored node must answer exactly like the live
    node for PRE-checkpoint aborted txs (they're in neither the versions
    table nor the replayed WAL tail — only the checkpoint meta)."""
    wal = str(tmp_path / "wal.jsonl")
    cp = CheckpointStore(str(tmp_path / "cps"))
    store = TxStore(spark, wal_path=wal)
    store.submit_tx([("put", {"id": "a", "v": 1})], tx_time=t(1))
    store.submit_tx(
        [("match", "a", {"id": "a", "v": 999}), ("put", {"id": "a", "v": 2})],
        tx_time=t(2),
    )
    store.submit_tx([("put", {"id": "c", "v": 7})], tx_time=t(3))
    assert store.commit() == {2}
    assert cp.checkpoint(store)["tx_id"] == 3

    restored = cp.restore_latest(spark, wal_path=wal)
    assert restored.tx_committed(1) is True
    assert restored.tx_committed(2) is False  # live node's answer
    assert restored.tx_committed(3) is True


def _wal_ops_df(spark, wal):
    """All committed WAL ops as an OPS_SCHEMA batch (test helper that
    stands in for the live TxLogStream foreachBatch feed)."""
    from crux_spark.bitemporal.store import OPS_SCHEMA
    from crux_spark.bitemporal.txlog import open_tx_log

    rows = [
        r
        for e in open_tx_log(wal).entries()
        if not e.get("aborted")
        for r in e["rows"]
    ]
    return spark.createDataFrame(
        [tuple(r.get(f.name) for f in OPS_SCHEMA.fields) for r in rows],
        OPS_SCHEMA,
    )


def test_text_index_checkpoint_restore_with_tail_replay(spark, tmp_path):
    """The reference checkpoints its Lucene dir alongside the KV index
    (crux-lucene via crux-core/src/crux/checkpoint.clj): a restored node
    restores BOTH and replays the tx-log tail through both. Restart test:
    build index, checkpoint it with the store, write more txs (update +
    delete + new doc) into the WAL only, restore, and require the restored
    index's search results to be identical to a live index that consumed
    every tx."""
    from crux_spark.functions.text_search import IncrementalTextIndex

    wal = str(tmp_path / "wal.jsonl")
    cp = CheckpointStore(str(tmp_path / "cps"))
    store = TxStore(spark, wal_path=wal)
    store.submit_tx([("put", {"id": "d1", "text": "alpha beta"})], tx_time=t(1))
    store.submit_tx([("put", {"id": "d2", "text": "beta gamma"})], tx_time=t(1))
    store.commit()

    idx = IncrementalTextIndex(spark)
    idx.listener(0, _wal_ops_df(spark, wal))
    assert idx.last_tx_id == 2
    meta = cp.checkpoint(store, indexes={"text": idx})
    assert meta["indexes"] == ["text"]

    # tail past the checkpoint: d1 rewritten (alpha gone), d2 deleted,
    # d3 new — lands only in the WAL
    store.submit_tx([("put", {"id": "d1", "text": "delta beta"})], tx_time=t(2))
    store.submit_tx([("delete", "d2")], tx_time=t(2))
    store.submit_tx([("put", {"id": "d3", "text": "gamma epsilon"})], tx_time=t(2))
    store.commit()

    restored, idxs = cp.restore_latest(
        spark, wal_path=wal, index_loaders={"text": IncrementalTextIndex.load}
    )
    ridx = idxs["text"]
    assert ridx.last_tx_id == 5
    assert restored.latest_completed_tx() == 5

    # live index that consumed every tx = ground truth
    live = IncrementalTextIndex(spark)
    live.listener(0, _wal_ops_df(spark, wal))
    for q in ("alpha", "beta", "gamma", "delta", "epsilon"):
        got = sorted((r.eid, r.score) for r in ridx.search(q).collect())
        want = sorted((r.eid, r.score) for r in live.search(q).collect())
        assert got == want, q
    assert ridx.search("alpha").count() == 0          # pre-update content gone
    assert {r.eid for r in ridx.search("beta").collect()} == {"d1"}
    assert {r.eid for r in ridx.search("gamma").collect()} == {"d3"}


def test_text_index_restore_skips_aborted_tail_tx(spark, tmp_path):
    """A match-aborted tx in the replayed tail indexes nothing (aborted
    txs are invisible to secondary indexes)."""
    from crux_spark.functions.text_search import IncrementalTextIndex

    wal = str(tmp_path / "wal.jsonl")
    cp = CheckpointStore(str(tmp_path / "cps"))
    store = TxStore(spark, wal_path=wal)
    store.submit_tx([("put", {"id": "d1", "text": "alpha"})], tx_time=t(1))
    store.commit()
    idx = IncrementalTextIndex(spark)
    idx.listener(0, _wal_ops_df(spark, wal))
    cp.checkpoint(store, indexes={"text": idx})

    # tail: tx 2 fails its match -> aborted; its put must not index
    store.submit_tx(
        [
            ("match", "d1", {"id": "d1", "text": "WRONG"}),
            ("put", {"id": "d1", "text": "poison"}),
        ],
        tx_time=t(2),
    )
    assert store.commit() == {2}

    _, idxs = cp.restore_latest(
        spark, wal_path=wal, index_loaders={"text": IncrementalTextIndex.load}
    )
    assert idxs["text"].search("poison").count() == 0
    assert {r.eid for r in idxs["text"].search("alpha").collect()} == {"d1"}


def test_restore_replays_evict_through_doc_store(spark, tmp_path):
    """An evict in the replayed WAL tail must run the doc-store
    tombstone pass, exactly like TxStore.recover: the doc store must be
    attached BEFORE the tail replays. Regression: restore_latest used to
    attach it after commit(), so a crash between submit and commit of an
    evict restored with the evicted docs still fetchable."""
    from crux_spark.bitemporal import splice
    from crux_spark.bitemporal.docstore import open_doc_store

    wal = str(tmp_path / "wal.jsonl")
    docs = str(tmp_path / "docs.jsonl")
    cp = CheckpointStore(str(tmp_path / "cps"))
    store = TxStore(spark, wal_path=wal, doc_store=docs)
    secret = {"id": "a", "v": "secret"}
    store.submit_tx([("put", secret)], tx_time=t(1))
    store.commit()
    cp.checkpoint(store)
    # evict submitted (durable in WAL + doc store untouched yet) but the
    # node dies before commit() — the checkpoint predates the evict
    store.submit_tx([("evict", "a")], tx_time=t(2))

    h = splice.content_hash(secret)
    assert open_doc_store(docs).fetch_docs([h]) == {h: secret}

    restored = cp.restore_latest(spark, wal_path=wal, doc_store=docs)
    assert restored.entity("a", valid_time=t(3)) is None
    # the tombstone pass ran during tail replay: content is gone from
    # the store, and documents() answers the redaction sentinel at most
    assert open_doc_store(docs).fetch_docs([h]).get(h, {}).get("v") != "secret"


def test_vector_index_checkpoint_restore_and_exactness(spark, tmp_path):
    """IncrementalVectorIndex: (a) probing ALL cells equals brute-force
    cosine ranking over the live docs — the exactness oracle; (b) the
    index checkpoints through the indexes= seam and a restored index
    replays the WAL tail (update + delete + insert) to answer identically
    to a live index; (c) nprobe=1 returns a subset of the all-cells
    ranking (the partition-pruned scale path)."""
    import numpy as np

    from crux_spark.operators.similarity import IncrementalVectorIndex

    rng = np.random.default_rng(7)
    centroids = np.eye(3, 4) + 0.01  # 3 cells over 4-dim vectors
    vecs = {f"v{i}": rng.normal(size=4).round(3).tolist() for i in range(12)}

    wal = str(tmp_path / "wal.jsonl")
    cp = CheckpointStore(str(tmp_path / "cps"))
    store = TxStore(spark, wal_path=wal)
    for eid, v in vecs.items():
        store.submit_tx([("put", {"id": eid, "embedding": v})], tx_time=t(1))
    store.commit()

    idx = IncrementalVectorIndex(spark, centroids)
    idx.listener(0, _wal_ops_df(spark, wal))

    # (a) all-cells probe == brute force
    q = [0.5, -0.2, 0.9, 0.1]
    got = [(r.eid, r.sim) for r in idx.search(q, k=5, nprobe=3).collect()]
    qn = np.array(q) / np.linalg.norm(q)
    sims = {
        e: round(float(np.dot(v, qn) / np.linalg.norm(v)), 6)
        for e, v in vecs.items()
    }
    want = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == want

    # (c) nprobe=1 prunes to one cell: a subset of the full ranking
    pruned = {r.eid for r in idx.search(q, k=5, nprobe=1).collect()}
    assert pruned <= {e for e, _ in sorted(sims.items(), key=lambda kv: -kv[1])}
    assert 0 < len(pruned) <= 5

    cp.checkpoint(store, indexes={"vec": idx})

    # tail: v0 moved, v1 deleted, v12 new
    vecs["v0"] = [9.0, 0.1, 0.1, 0.1]
    store.submit_tx([("put", {"id": "v0", "embedding": vecs["v0"]})], tx_time=t(2))
    store.submit_tx([("delete", "v1")], tx_time=t(2))
    del vecs["v1"]
    vecs["v12"] = [0.4, -0.3, 1.0, 0.0]
    store.submit_tx([("put", {"id": "v12", "embedding": vecs["v12"]})], tx_time=t(2))
    store.commit()

    _, idxs = cp.restore_latest(
        spark, wal_path=wal,
        index_loaders={"vec": IncrementalVectorIndex.load},
    )
    ridx = idxs["vec"]
    assert ridx.last_tx_id == store.latest_completed_tx()
    got2 = [(r.eid, r.sim) for r in ridx.search(q, k=5, nprobe=3).collect()]
    sims2 = {
        e: round(float(np.dot(v, qn) / np.linalg.norm(v)), 6)
        for e, v in vecs.items()
    }
    want2 = sorted(sims2.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got2 == want2
    assert all(e != "v1" for e, _ in got2)  # deleted doc gone


def test_scheduled_checkpointer(spark, tmp_path):
    """Checkpointer (checkpoint.clj ->checkpointer start loop): ticks
    checkpoint on a schedule, failures log-and-continue, close() stops
    the thread; indexes persist on every scheduled save."""
    from crux_spark.bitemporal.checkpoint import Checkpointer
    from crux_spark.functions.text_search import IncrementalTextIndex

    cp = CheckpointStore(str(tmp_path / "cps"), approx_frequency=0.0)
    store = TxStore(spark)
    store.submit_tx([("put", {"id": "d1", "text": "alpha"})], tx_time=t(1))
    store.commit()
    idx = IncrementalTextIndex(spark)
    store.index_listeners.append(idx.listener)  # not fed yet: empty index

    ckpt = Checkpointer(cp, store, indexes={"text": idx}, interval=0.05)
    # deterministic drive: tick() == one scheduled firing
    meta = ckpt.tick()
    assert meta is not None and meta["indexes"] == ["text"]
    # second tick: no new txs -> gated no-op, not an error
    assert ckpt.tick() is None

    store.submit_tx([("put", {"id": "d2", "text": "beta"})], tx_time=t(2))
    store.commit()  # index_listeners fed d2 through the commit seam
    assert ckpt.tick()["tx_id"] == 2

    # a failing save must not raise out of the schedule
    class Boom:
        def save(self, path):
            raise RuntimeError("upload failed")

    store.submit_tx([("put", {"id": "d3", "text": "gamma"})], tx_time=t(3))
    store.commit()
    bad = Checkpointer(cp, store, indexes={"boom": Boom()})
    assert bad.tick() is None  # logged, swallowed
    # ...and the good checkpointer still works afterwards
    assert ckpt.tick()["tx_id"] == 3

    # thread smoke: the loop fires on its own, close() stops it
    import time as _time

    store.submit_tx([("put", {"id": "d4", "text": "delta"})], tx_time=t(4))
    store.commit()
    ckpt.start()
    deadline = _time.time() + 10
    while _time.time() < deadline:
        if cp.available_checkpoints()[0]["tx_id"] == 4:
            break
        _time.sleep(0.05)
    ckpt.close()
    assert ckpt._thread is None
    assert cp.available_checkpoints()[0]["tx_id"] == 4

    # the latest scheduled checkpoint restores with a live index
    restored, idxs = cp.restore_latest(
        spark, index_loaders={"text": IncrementalTextIndex.load}
    )
    assert restored.latest_completed_tx() == 4
    assert {r.eid for r in idxs["text"].search("beta").collect()} == {"d2"}


def test_checkpoint_snapshot_atomic_under_concurrent_commits(spark, tmp_path):
    """ADVICE r11: a commit landing between the watermark read and the
    versions save must NOT leak into the checkpoint — the restore's
    WAL-tail replay (entries > tx_id) would re-apply it, duplicating
    version rows. checkpoint() snapshots (versions, tx_id, aborted)
    atomically under the store mutex; here a writer thread hammers
    commits while checkpoints run, and every checkpoint must satisfy
    max(tx_from in saved versions) <= recorded tx_id."""
    import threading

    wal = str(tmp_path / "wal.jsonl")
    cp = CheckpointStore(str(tmp_path / "cps"), approx_frequency=0.0)
    store = TxStore(spark, wal_path=wal)
    store.submit_tx([("put", {"id": "d0", "v": 0})], tx_time=t(1))
    store.commit()

    stop = threading.Event()
    errs: list[BaseException] = []

    def writer():
        i = 0
        try:
            while not stop.is_set() and i < 40:
                i += 1
                store.submit_tx(
                    [("put", {"id": f"w{i % 4}", "v": i})], tx_time=t(2)
                )
                store.commit()
        except BaseException as e:  # surfaces in the main thread
            errs.append(e)

    th = threading.Thread(target=writer)
    th.start()
    metas = []
    try:
        for _ in range(5):
            m = cp.checkpoint(store, force=True)
            if m:
                metas.append(m)
    finally:
        stop.set()
        th.join(timeout=60)
    assert not errs, errs
    assert metas, "no checkpoint completed"
    import pyspark.sql.functions as F

    for m in metas:
        saved = spark.read.parquet(str(tmp_path / "cps" / m["dir"].split("/")[-1] / "versions"))
        hi = saved.agg(F.max("tx_from").alias("m")).first().m
        assert hi is None or int(hi) <= m["tx_id"], (hi, m["tx_id"])
    # and the newest checkpoint + WAL tail restores to the writer's end
    # state with no duplicate version rows
    restored = cp.restore_latest(spark, wal_path=wal)
    live_rows = store.versions.count()
    assert restored.versions.count() == live_rows
    assert restored.versions.distinct().count() == live_rows


def test_failed_index_save_removes_partial_checkpoint_dir(spark, tmp_path):
    """A failed secondary-index save must not leave a meta-less orphan
    dir (cleanup() only prunes dirs WITH checkpoint.json)."""
    import os
    import pytest

    cp = CheckpointStore(str(tmp_path / "cps"), approx_frequency=0.0)
    store = TxStore(spark)
    store.submit_tx([("put", {"id": "a", "v": 1})], tx_time=t(1))
    store.commit()

    class Boom:
        def save(self, path):
            raise RuntimeError("upload failed")

    with pytest.raises(RuntimeError):
        cp.checkpoint(store, indexes={"boom": Boom()})
    assert os.listdir(str(tmp_path / "cps")) == []
    # the store is unharmed: a clean checkpoint still works
    assert cp.checkpoint(store)["tx_id"] == 1


def test_restored_index_survives_checkpoint_pruning(spark, tmp_path):
    """ADVICE r11: load() must decouple from the checkpoint dir (like
    TxStore.load) — retention pruning the restored-from checkpoint must
    not break a live index's searches."""
    import shutil

    from crux_spark.functions.text_search import IncrementalTextIndex

    wal = str(tmp_path / "wal.jsonl")
    cp = CheckpointStore(str(tmp_path / "cps"), approx_frequency=0.0)
    store = TxStore(spark, wal_path=wal)
    store.submit_tx([("put", {"id": "d1", "text": "alpha beta"})], tx_time=t(1))
    store.commit()
    idx = IncrementalTextIndex(spark)
    idx.listener(0, _wal_ops_df(spark, wal))
    meta = cp.checkpoint(store, indexes={"text": idx})

    _, idxs = cp.restore_latest(
        spark, wal_path=wal, index_loaders={"text": IncrementalTextIndex.load}
    )
    # simulate retention deleting the very checkpoint we restored from
    shutil.rmtree(meta["dir"])
    assert {r.eid for r in idxs["text"].search("alpha").collect()} == {"d1"}


def test_index_version_override(spark, tmp_path, monkeypatch):
    """Port of index_version_override_test.clj: a checkpoint stamped
    with a different index version refuses to restore (exact match
    required — neither endpoint of the skip flag may be wrong), the
    (from, to) skip flag permits exactly that bump, and the flag only
    needs supplying once because the next checkpoint carries the new
    version."""
    import pytest

    from crux_spark.bitemporal import checkpoint as cp_mod
    from crux_spark.bitemporal.checkpoint import IndexVersionOutOfSyncError

    cp = CheckpointStore(str(tmp_path / "cps"), approx_frequency=0.0)
    store = TxStore(spark)
    store.submit_tx([("put", {"id": "a", "v": 1})], tx_time=t(1))
    store.commit()
    v = cp_mod.INDEX_VERSION
    assert cp.checkpoint(store)["index_version"] == v

    # a build with a bumped index version refuses the old checkpoint
    monkeypatch.setattr(cp_mod, "INDEX_VERSION", v + 1)
    with pytest.raises(IndexVersionOutOfSyncError):
        cp.restore_latest(spark)
    # version numbers have to match exactly on BOTH ends of the flag
    with pytest.raises(IndexVersionOutOfSyncError):
        cp.restore_latest(spark, skip_index_version_bump=(v - 1, v + 1))
    with pytest.raises(IndexVersionOutOfSyncError):
        cp.restore_latest(spark, skip_index_version_bump=(v, v + 2))
    # the correct skip flag permits the bump
    restored = cp.restore_latest(spark, skip_index_version_bump=(v, v + 1))
    assert restored.entity("a")["v"] == 1
    # only needed once: a new checkpoint from this build stamps v+1
    restored.submit_tx([("put", {"id": "b", "v": 2})], tx_time=t(2))
    restored.commit()
    assert cp.checkpoint(restored, force=True)["index_version"] == v + 1
    again = cp.restore_latest(spark)  # no flag needed anymore
    assert again.entity("b")["v"] == 2


def test_minhash_index_checkpoint_restore_and_parity(spark, tmp_path):
    """IncrementalMinHashIndex rides the SAME indexes= checkpoint seam as
    the text/vector indexes: a restored index (a) carries the watermark,
    (b) replays the WAL tail (update + delete + new doc) via its
    listener, and (c) then answers a fresh probe batch identically to a
    live index that saw every batch."""
    from crux_spark.operators.dedup import IncrementalMinHashIndex

    base = ("the quick brown fox jumps over the lazy dog while the "
            "rain in spain stays mainly on the plain tonight")
    wal = str(tmp_path / "wal.jsonl")
    cp = CheckpointStore(str(tmp_path / "cps"))
    store = TxStore(spark, wal_path=wal)
    store.submit_tx([
        ("put", {"id": "a", "text": base}),
        ("put", {"id": "b", "text": base + " again"}),
        ("put", {"id": "c", "text": "completely unrelated words about "
                                    "nothing shared with the others"}),
    ], tx_time=t(1))
    store.commit()

    live = IncrementalMinHashIndex(spark, num_hashes=32, bands=16,
                                   threshold=0.5)
    out1 = live.listener(0, _wal_ops_df(spark, wal))
    assert {(r.id_a, r.id_b) for r in out1.collect()} == {("a", "b")}
    cp.checkpoint(store, indexes={"mh": live})

    # WAL tail past the checkpoint: b rewritten away, c deleted, d ~ a
    store.submit_tx([
        ("put", {"id": "b", "text": "different text now entirely with "
                                    "no overlap left at all here"}),
        ("delete", "c"),
        ("put", {"id": "d", "text": base + " tomorrow"}),
    ], tx_time=t(2))
    store.commit()

    _, idxs = cp.restore_latest(
        spark, wal_path=wal,
        index_loaders={"mh": IncrementalMinHashIndex.load},
    )
    ridx = idxs["mh"]
    assert ridx.last_tx_id == store.latest_completed_tx()
    assert ridx.bands == 16 and ridx.threshold == 0.5

    # live index sees the tail batch directly
    tail = _wal_ops_df(spark, wal).filter("tx_id >= 2")
    live.listener(1, tail)

    # both now answer a fresh probe batch identically: e ~ a/d
    probe = spark.createDataFrame(
        [("e", base + " yesterday")], ["doc_id", "text"]
    )
    want = {("a", "e"), ("d", "e")}
    got_live = {(r.id_a, r.id_b) for r in live.add_batch(probe).collect()}
    got_rest = {(r.id_a, r.id_b) for r in ridx.add_batch(probe).collect()}
    assert got_live == want
    assert got_rest == want
