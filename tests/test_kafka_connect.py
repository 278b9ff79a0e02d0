"""Kafka Connect sink/source semantics
(crux-kafka-connect/src/crux/kafka/connect.clj;
crux-test/test/crux/kafka_connect_test.clj — test-sink-task,
test-source-task-tx-mode-edn, test-source-task-doc-mode-edn). Records
are dicts with the Connect record's public fields; the Connect runtime
harness is the only piece not exercised."""

import datetime as dt

import pytest

from crux_spark.bitemporal.store import TxStore
from crux_spark.sources import kafka_connect as kc


def t(day):
    return dt.datetime(2023, 7, day)


@pytest.fixture()
def store(spark, tmp_path):
    return TxStore(spark, wal_path=str(tmp_path / "wal.jsonl"))


def test_sink_task(store):
    # put with key contained in document
    kc.submit_sink_records(store, [{"value": {"id": "foo"}}])
    store.commit()
    assert store.entity("foo") == {"id": "foo"}
    # put with key contained in the sink record
    kc.submit_sink_records(store, [{"key": "bar", "value": {"hello": "world"}}])
    store.commit()
    assert store.entity("bar") == {"hello": "world", "id": "bar"}
    # delete = key with an empty (null) value
    kc.submit_sink_records(store, [{"key": "foo"}])
    store.commit()
    assert store.entity("foo") is None
    # custom id.key config
    kc.submit_sink_records(
        store,
        [{"value": {"kafka_id": "kafka-id"}}],
        props={kc.ID_KEY_CONFIG: "kafka_id"},
    )
    store.commit()
    assert store.entity("kafka-id") == {"kafka_id": "kafka-id", "id": "kafka-id"}
    # JSON-string and payload/schema-envelope values parse too
    kc.submit_sink_records(
        store,
        [
            {"value": '{"id": "js", "n": 1}'},
            {"value": {"payload": '{"id": "pl", "n": 2}', "schema": {}}},
        ],
    )
    store.commit()
    assert store.entity("js")["n"] == 1
    assert store.entity("pl")["n"] == 2
    # a record with neither doc id, id.key hit, nor key gets a fresh UUID
    op = kc.transform_sink_record({"value": {"x": 1}})
    assert op[0] == "put" and len(op[1]["id"]) == 36
    # one poll batch = ONE transaction
    before = store.latest_submitted_tx()
    kc.submit_sink_records(
        store, [{"value": {"id": "a1"}}, {"value": {"id": "a2"}}]
    )
    assert store.latest_submitted_tx() == before + 1
    assert kc.submit_sink_records(store, []) is None


def test_source_task_tx_mode(store):
    store.submit_tx([("put", {"id": "hello"})], tx_time=t(1))
    store.commit()
    recs = kc.poll_source_tx_mode(store)
    assert [r["offset"] for r in recs] == [1]
    assert recs[0]["value"] == [
        {"op": "put", "eid": "hello", "doc": {"id": "hello"}}
    ]

    # match ops are carried, with the expected doc
    store.submit_tx([("match", "hello", {"id": "hello"})], tx_time=t(2))
    store.commit()
    recs = kc.poll_source_tx_mode(store, after_tx_id=1)
    assert recs[0]["value"] == [
        {
            "op": "match",
            "eid": "hello",
            "doc": None,
            "expected": {"id": "hello"},
        }
    ]

    # mixed tx stays one record, ops in order
    store.submit_tx(
        [
            ("put", {"id": "bar", "age": 20}),
            ("put", {"id": "foo"}),
            ("match", "foo", {"id": "foo"}),
        ],
        tx_time=t(3),
    )
    store.commit()
    recs = kc.poll_source_tx_mode(store, after_tx_id=2)
    assert len(recs) == 1 and len(recs[0]["value"]) == 3
    assert [o["op"] for o in recs[0]["value"]] == ["put", "put", "match"]

    # FAILED transactions are skipped entirely...
    store.submit_tx(
        [
            ("put", {"id": "bar2"}),
            ("match", "bar2", {"id": "bar2", "key": "not-found"}),
        ],
        tx_time=t(4),
    )
    store.commit()
    assert kc.poll_source_tx_mode(store, after_tx_id=3) == []
    # ...and reading continues past them
    store.submit_tx([("put", {"id": "test"})], tx_time=t(5))
    store.commit()
    recs = kc.poll_source_tx_mode(store, after_tx_id=3)
    assert [r["offset"] for r in recs] == [5]
    assert recs[0]["value"][0]["eid"] == "test"


def test_source_task_doc_mode(store):
    store.submit_tx([("put", {"id": "hello-doc"})], tx_time=t(1))
    store.commit()
    recs = kc.poll_source_doc_mode(store)
    assert recs == [
        {"offset": 1, "key": "hello-doc", "value": {"id": "hello-doc"}}
    ]
    # match emits NOTHING in doc mode
    store.submit_tx([("match", "hello-doc", {"id": "hello-doc"})], tx_time=t(2))
    store.commit()
    assert kc.poll_source_doc_mode(store, after_tx_id=1) == []
    # delete -> tombstone (null value)
    store.submit_tx([("delete", "hello-doc")], tx_time=t(3))
    store.commit()
    assert kc.poll_source_doc_mode(store, after_tx_id=2) == [
        {"offset": 3, "key": "hello-doc", "value": None}
    ]
    # evict -> tombstone too
    store.submit_tx([("evict", "hello-doc")], tx_time=t(4))
    store.commit()
    assert kc.poll_source_doc_mode(store, after_tx_id=3) == [
        {"offset": 4, "key": "hello-doc", "value": None}
    ]


def test_sink_record_falsy_ids_preserved():
    """Falsy-but-valid ids (0, empty string, False) must key the doc —
    an `or` chain would silently re-key under the record key / a UUID
    and split the entity's history."""
    from crux_spark.sources.kafka_connect import transform_sink_record

    for falsy in (0, "", False):
        op = transform_sink_record(
            {"key": "reckey", "value": {"id": falsy, "v": 1}}
        )
        assert op[0] == "put" and op[1]["id"] == falsy
    # id-key config pointing at a falsy field value
    op = transform_sink_record(
        {"key": "reckey", "value": {"custom": 0, "v": 1}},
        {"id.key": "custom"},
    )
    assert op[1]["id"] == 0
