"""Durable-log replay semantics (crux-test/test/crux/replay_test.clj):
a node rebuilt from nothing but the tx-log reproduces the indexed state —
including nested tx fns and failed tx fns — on BOTH WAL transports."""

import pytest

from crux_spark.bitemporal.store import TxStore


@pytest.fixture(params=["jsonl", "sqlite"])
def wal(request, tmp_path):
    if request.param == "jsonl":
        return str(tmp_path / "wal.jsonl")
    return f"sqlite:{tmp_path}/wal.db"


def test_drop_db(spark, wal):
    """replay_test.clj drop-db: the index dies, the log survives, the
    rebuilt node sees the doc and the watermark."""
    store = TxStore(spark, wal_path=wal)
    store.submit_tx([("put", {"id": "hello"})])
    store.commit()
    del store

    node2 = TxStore.recover(spark, wal)
    assert node2.latest_submitted_tx() == 1
    assert node2.entity("hello") == {"id": "hello"}


def test_more_txs(spark, wal):
    """replay_test.clj test-more-txs (scaled 1000 -> 60 for the sandbox):
    every tx replays, the watermark matches, the full entity set reads
    back."""
    n = 60
    store = TxStore(spark, wal_path=wal)
    for x in range(n):
        store.submit_tx([("put", {"id": f"id-{x}"})])
    store.commit()

    node2 = TxStore.recover(spark, wal)
    assert node2.latest_submitted_tx() == n
    assert node2.versions.select("eid").distinct().count() == n
    assert node2.entity("id-37") == {"id": "id-37"}


def test_replaces_tx_fn_arg_docs(spark, wal):
    """replay_test.clj replaces-tx-fn-arg-docs: the WAL stores the
    fn-EXPANDED ops, so a recovered node needs no fn registry and sees
    the fn's effects — incl. the no-arg and NESTED fn forms."""
    store = TxStore(spark, wal_path=wal)
    store.register_tx_fn(
        "put-ivan", lambda ctx, doc: [("put", {**doc, "id": "ivan"})]
    )
    store.submit_tx([("fn", "put-ivan", {"name": "Ivan"})])
    store.commit()
    assert store.entity("ivan") == {"id": "ivan", "name": "Ivan"}

    # no-args fn
    store.register_tx_fn(
        "no-args", lambda ctx: [("put", {"id": "no-fn-args-doc"})]
    )
    store.submit_tx([("fn", "no-args")])
    store.commit()

    # nested fn: put-bob-and-ivan emits a further fn op
    store.register_tx_fn(
        "put-bob-and-ivan",
        lambda ctx, bob, ivan: [
            ("put", {**bob, "id": "bob"}),
            ("fn", "put-ivan", ivan),
        ],
    )
    store.submit_tx([("fn", "put-bob-and-ivan", {"name": "Bob"}, {"name": "Ivan2"})])
    store.commit()
    assert store.entity("ivan") == {"id": "ivan", "name": "Ivan2"}
    assert store.entity("bob") == {"id": "bob", "name": "Bob"}

    # recovered node: NO fns registered, same state
    node2 = TxStore.recover(spark, wal)
    assert node2._tx_fns == {}
    assert node2.entity("ivan") == {"id": "ivan", "name": "Ivan2"}
    assert node2.entity("bob") == {"id": "bob", "name": "Bob"}
    assert node2.entity("no-fn-args-doc") == {"id": "no-fn-args-doc"}


@pytest.mark.parametrize("seed", [20260814, 777])
def test_durability_op_soup(spark, wal, seed):
    """Seeded randomized durability property: a soup of puts / ranged
    puts / deletes / matches (some failing) / evicts / re-puts across
    several entities, committed in random-sized txs, must survive
    compact_wal + recover with IDENTICAL per-entity corrected history,
    identical aborted-tx set, and identical current reads — the
    WAL-replay analogue of the r3 rectangle miner. Seed 20260814 is the
    one that caught the batch-visible match-abort fixpoint bug."""
    import datetime as dt
    import random

    rng = random.Random(seed)
    eids = ["a", "b", "c"]
    store = TxStore(spark, wal_path=wal)
    vcount = 0
    for txn in range(12):
        ops = []
        for _ in range(rng.randint(1, 3)):
            eid = rng.choice(eids)
            kind = rng.choice(["put", "put_r", "delete", "match", "evict"])
            vf = dt.datetime(2020, 1, rng.randint(1, 25))
            if kind == "put":
                vcount += 1
                ops.append(("put", {"id": eid, "v": vcount}, vf))
            elif kind == "put_r":
                vcount += 1
                vt = vf + dt.timedelta(days=rng.randint(1, 4))
                ops.append(("put", {"id": eid, "v": vcount}, vf, vt))
            elif kind == "delete":
                ops.append(("delete", eid, vf))
            elif kind == "match":
                # half the matches expect a doc that's likely wrong ->
                # some txs abort, exercising abort replay
                expected = (
                    None if rng.random() < 0.5
                    else {"id": eid, "v": rng.randint(1, 5)}
                )
                ops.append(("match", eid, expected, vf))
            else:
                ops.append(("evict", eid))
        store.submit_tx(ops, tx_time=dt.datetime(2021, 1, 1 + txn))
        if rng.random() < 0.5:
            store.commit()
    store.commit()

    def fingerprint(s):
        return {
            "aborted": sorted(s.aborted_txs),
            "hist": {
                e: [
                    (v["doc"], v["valid_from"], v["valid_to"], v["tx_from"])
                    for v in s.entity_history(e, with_corrections=True)
                ]
                for e in eids
            },
            "now": {e: s.entity(e) for e in eids},
        }

    live = fingerprint(store)
    store.compact_wal()
    restored = TxStore.recover(spark, wal)
    assert fingerprint(restored) == live


def test_failed_tx_fn(spark, wal):
    """replay_test.clj "failed tx-fn": an UNKNOWN tx fn fails the TX
    (index-time resolution), not the submit; later txs commit; the
    failure replays as a failure. A THROWING fn behaves the same
    (tx.clj:218-227)."""
    store = TxStore(spark, wal_path=wal)
    bad = store.submit_tx([("fn", "put-petr", {"name": "Petr"})])
    assert store.commit() == {bad}
    assert store.entity("petr") is None

    store.register_tx_fn("boom", lambda ctx: 1 / 0)
    boom = store.submit_tx([("fn", "boom"), ("put", {"id": "collateral"})])
    assert store.commit() == {boom}
    assert store.entity("collateral") is None

    store.submit_tx([("put", {"id": "foo"})])
    store.commit()
    assert store.entity("foo") == {"id": "foo"}

    node2 = TxStore.recover(spark, wal)
    assert node2.entity("petr") is None
    assert node2.entity("collateral") is None
    assert node2.entity("foo") == {"id": "foo"}
    assert node2.tx_committed(bad) is False


def test_tx_time_survives_process_timezone(spark, tmp_path):
    """Port of crux-test jdbc/tx_time_tz_test.clj (regression #1071):
    a recovered node must report the same tx-time regardless of the
    process default timezone. Here the WAL stores tx_time as epoch
    micros and naive datetimes are UTC by convention (splice.to_us), so
    recovery under Tokyo/London must reproduce the original instant
    bit-for-bit."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    from crux_spark.bitemporal.store import TxStore

    wal = str(tmp_path / "wal.jsonl")
    store = TxStore(spark, wal_path=wal)
    store.submit_tx([("put", {"id": "foo"})])
    store.commit()
    want_us = store.versions.agg(F.max("tx_time")).first()[0]
    want_tx = store.latest_completed_tx()

    orig = os.environ.get("TZ")
    try:
        for tz in ("UTC", "Asia/Tokyo", "Europe/London"):
            os.environ["TZ"] = tz
            _time.tzset()
            rec = TxStore.recover(spark, wal)
            assert rec.latest_completed_tx() == want_tx, tz
            got_us = rec.versions.agg(F.max("tx_time")).first()[0]
            assert got_us == want_us, (tz, got_us, want_us)
    finally:
        if orig is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = orig
        _time.tzset()
