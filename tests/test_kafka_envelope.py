"""Kafka tx-log envelope contract, broker-free.

The reference consumes its tx topic with a full consumer loop
(crux-kafka/src/crux/kafka.clj). No broker exists in this sandbox, so
this fixture drives everything EXCEPT the socket: a recorded segment —
records with the PUBLIC wire columns Spark's kafka source exposes
(key/value binary, topic, partition, offset, timestamp) whose values
are the exact JSON envelope bytes the WAL persists — goes through
parse_kafka_envelope (from_json + redelivery dedup + explode) and the
cogrouped splice apply, and must reproduce the live store exactly:
match-aborts re-derived, deletes and ranged puts intact, fn-aborted
txs (empty rows arrays) indexing nothing.
"""

import datetime as dt
import json

from crux_spark.bitemporal.store import TxStore
from crux_spark.streaming.ingest import (
    KAFKA_WIRE_SCHEMA,
    parse_kafka_envelope,
)


def t(day):
    return dt.datetime(2022, 9, day)


def _fingerprint(s, eids):
    return {
        e: (
            s.entity(e, valid_time=t(20)),
            [
                (v["doc"], v["valid_from"], v["valid_to"])
                for v in s.entity_history(e, with_corrections=True)
            ],
        )
        for e in eids
    }


def test_kafka_envelope_replay(spark, tmp_path):
    wal = str(tmp_path / "wal.jsonl")
    store = TxStore(spark, wal_path=wal)
    store.register_tx_fn("boom", lambda db: 1 / 0)
    store.submit_tx([("put", {"id": "a", "v": 1})], tx_time=t(1))
    store.submit_tx([("put", {"id": "b", "v": 2}, t(1), t(10))], tx_time=t(1))
    # tx 3: failed match -> whole tx aborts (rows ARE in the log; the
    # replay must re-derive the abort)
    store.submit_tx(
        [("match", "a", {"id": "a", "v": 99}), ("put", {"id": "a", "v": 3})],
        tx_time=t(2),
    )
    store.submit_tx([("delete", "b", t(5))], tx_time=t(3))
    # tx 5: throwing tx fn -> aborted AT SUBMIT, empty rows in the log
    store.submit_tx([("fn", "boom")], tx_time=t(3))
    store.submit_tx([("put", {"id": "a", "v": 4})], tx_time=t(4))
    assert store.commit() == {3, 5}

    # --- the recorded segment fixture --------------------------------
    entries = list(store._wal.entries())
    ts0 = dt.datetime(2022, 9, 1, 12, 0, 0)
    records = [
        (
            None,
            json.dumps(e).encode(),
            "crux-tx-log",
            0,  # ONE partition: offset order == tx order
            off,
            ts0 + dt.timedelta(seconds=off),
            0,
        )
        for off, e in enumerate(entries)
    ]
    # at-least-once: record for tx 2 REDELIVERED (same bytes, later
    # offset), and the batch arrives out of order
    r = records[1]
    records.append((r[0], r[1], r[2], r[3], len(records), r[5], r[6]))
    records = records[::-1]

    raw = spark.createDataFrame(records, KAFKA_WIRE_SCHEMA)
    ops = parse_kafka_envelope(raw)
    assert set(ops.columns) == {f.name for f in __import__(
        "crux_spark.streaming.ingest", fromlist=["TX_LOG_SCHEMA"]
    ).TX_LOG_SCHEMA.fields}
    # dedup: tx 2's ops appear exactly once despite the redelivery
    assert ops.filter("tx_id = 2").count() == 1

    replayed = TxStore(spark)
    replayed.apply_ops_df(ops)
    assert replayed.aborted_txs == {3}  # match-abort re-derived
    assert _fingerprint(replayed, ["a", "b"]) == _fingerprint(
        store, ["a", "b"]
    )
