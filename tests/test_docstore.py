"""Content-addressed doc-store transports (db.clj DocumentStore;
document_store.clj / crux-jdbc / crux-s3 — one seam, swappable
backends). Parametrized over BOTH in-sandbox transports (JSONL = the
blob-store analogue, sqlite = the JDBC analogue), like the tx-log
transport tests."""

import datetime as dt
import json

import pytest

from crux_spark.bitemporal import splice
from crux_spark.bitemporal.checkpoint import CheckpointStore
from crux_spark.bitemporal.docstore import open_doc_store
from crux_spark.bitemporal.store import TxStore


def t(day):
    return dt.datetime(2023, 3, day)


@pytest.fixture(params=["jsonl", "sqlite", "s3"])
def ds_spec(request, tmp_path, monkeypatch):
    if request.param == "jsonl":
        return str(tmp_path / "docs.jsonl")
    if request.param == "s3":
        # blob transport (crux-s3 analogue) over the local emulation
        monkeypatch.setenv("CRUX_SPARK_BLOB_DIR", str(tmp_path / "blob"))
        return "s3://test-bucket/crux/docs"
    return "sqlite:" + str(tmp_path / "docs.db")


def test_submit_and_fetch(spark, ds_spec):
    store = TxStore(spark, doc_store=ds_spec)
    d1 = {"id": "a", "v": 1}
    d2 = {"id": "b", "v": 2}
    store.submit_tx([("put", d1), ("put", d2)], tx_time=t(1))
    h1, h2 = splice.content_hash(d1), splice.content_hash(d2)
    # docs are in the transport at SUBMIT time (before commit), the
    # reference's write order
    backend = open_doc_store(ds_spec)
    assert backend.fetch_docs([h1, h2]) == {h1: d1, h2: d2}
    store.commit()
    assert store.documents([h1, h2]) == {h1: d1, h2: d2}


def test_match_expected_docs_are_stored(spark, ds_spec):
    store = TxStore(spark, doc_store=ds_spec)
    d = {"id": "a", "v": 1}
    store.submit_tx([("put", d)], tx_time=t(1))
    store.commit()
    exp = {"id": "a", "v": 999}  # match arg, never put
    store.submit_tx([("match", "a", exp), ("put", {"id": "a", "v": 2})],
                    tx_time=t(2))
    store.commit()
    h = splice.content_hash(exp)
    assert store.documents([h]) == {h: exp}


def test_committed_evict_tombstones_only_that_entity(spark, ds_spec):
    store = TxStore(spark, doc_store=ds_spec)
    da = {"id": "a", "v": 1}
    db_ = {"id": "b", "v": 2}
    store.submit_tx([("put", da)], tx_time=t(1))
    store.submit_tx([("put", db_)], tx_time=t(1))
    store.submit_tx([("evict", "a")], tx_time=t(2))
    store.commit()
    ha, hb = splice.content_hash(da), splice.content_hash(db_)
    assert store.documents([ha]) == {ha: {"crux.db/evicted": True}}
    assert store.documents([hb]) == {hb: db_}


def test_aborted_tx_evict_does_not_evict(spark, ds_spec):
    store = TxStore(spark, doc_store=ds_spec)
    d = {"id": "a", "v": 1}
    store.submit_tx([("put", d)], tx_time=t(1))
    store.commit()
    # failed match in the same tx -> the evict never happened
    store.submit_tx(
        [("match", "a", {"id": "a", "v": 999}), ("evict", "a")], tx_time=t(2)
    )
    aborted = store.commit()
    assert aborted
    h = splice.content_hash(d)
    assert store.documents([h]) == {h: d}


def test_post_evict_reput_survives_live_and_replay(spark, ds_spec, tmp_path):
    """Evict keys on content referenced BEFORE the evict: a re-created
    entity's new doc must survive — both live (incremental commits) and
    under a single-batch recover() replay of the same WAL."""
    wal = str(tmp_path / "wal.jsonl")
    store = TxStore(spark, wal_path=wal, doc_store=ds_spec)
    old = {"id": "a", "v": 1}
    new = {"id": "a", "v": 2}
    store.submit_tx([("put", old)], tx_time=t(1))
    store.submit_tx([("evict", "a")], tx_time=t(2))
    store.submit_tx([("put", new)], tx_time=t(3))
    store.commit()
    ho, hn = splice.content_hash(old), splice.content_hash(new)
    assert store.documents([ho]) == {ho: {"crux.db/evicted": True}}
    assert store.documents([hn]) == {hn: new}

    rec = TxStore.recover(spark, wal, doc_store=ds_spec)
    assert rec.documents([ho]) == {ho: {"crux.db/evicted": True}}
    assert rec.documents([hn]) == {hn: new}
    assert rec.entity("a", valid_time=t(4))["v"] == 2


def test_checkpoint_restore_reattaches_doc_store(spark, ds_spec, tmp_path):
    cp = CheckpointStore(str(tmp_path / "cps"))
    store = TxStore(spark, doc_store=ds_spec)
    d = {"id": "a", "v": 7}
    store.submit_tx([("put", d)], tx_time=t(1))
    store.commit()
    cp.checkpoint(store)
    restored = cp.restore_latest(spark, doc_store=ds_spec)
    h = splice.content_hash(d)
    assert restored.documents([h]) == {h: d}
