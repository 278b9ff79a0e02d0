"""Kafka Connect sink/source semantics (crux-kafka-connect/src/crux/
kafka/connect.clj; kafka_connect_test.clj).

The reference ships a Connect sink (records → tx ops, one tx per
batch) and source (tx log → records, tx-mode or doc-mode, offsets by
tx id). Here the same record transforms and polling contract over this
engine's TxStore; records are plain dicts with the Connect record's
public fields (key, value, topic), so the only missing piece in a real
deployment is the Connect runtime harness itself.

Semantics kept from the reference:
- sink: a record with a NULL value and a key is a DELETE of that key;
  otherwise the value parses to a document (dict as-is, JSON string,
  or a {"payload": ..., "schema": ...} envelope) and becomes a PUT
  whose eid is doc["id"] (crux.db/id analogue), else the configured
  id-key field, else the record key, else a fresh UUID;
- sink batches submit as ONE transaction (submit-sink-records);
- source tx-mode: one record per committed tx, value carries the tx's
  ops, offset = tx id; doc-mode: one record per op, key = eid, puts
  carry the doc, deletes carry a NULL value (Kafka tombstone);
- polling resumes from the consumer's stored offset (after_tx_id).
"""

from __future__ import annotations

import json
import uuid
from typing import Any

ID_KEY_CONFIG = "id.key"


def record_value_to_doc(value: Any) -> dict:
    """Connect record value → document dict (record->edn)."""
    if isinstance(value, dict) and set(value.keys()) == {"payload", "schema"}:
        payload = value["payload"]
        if isinstance(payload, str):
            return json.loads(payload)
        if isinstance(payload, dict):
            return payload
        raise ValueError(f"unknown JSON payload type: {payload!r}")
    if isinstance(value, dict):
        return value
    if isinstance(value, str):
        return json.loads(value)
    raise ValueError(f"unknown message type: {value!r}")


def transform_sink_record(record: dict, props: dict | None = None) -> tuple:
    """One sink record → one tx op (transform-sink-record)."""
    props = props or {}
    if record.get("value") is None and record.get("key") is not None:
        return ("delete", record["key"])
    doc = dict(record_value_to_doc(record["value"]))
    # explicit None checks, not truthiness: 0, "" and False are valid ids
    # (an `or` chain would silently re-key the doc and split its history)
    eid = doc.get("id")
    if eid is None and props.get(ID_KEY_CONFIG) is not None:
        eid = doc.get(props[ID_KEY_CONFIG])
    if eid is None:
        eid = record.get("key")
    if eid is None:
        eid = str(uuid.uuid4())
    doc["id"] = eid
    return ("put", doc)


def submit_sink_records(store, records: list[dict],
                        props: dict | None = None) -> int | None:
    """All records of the poll batch as ONE transaction
    (submit-sink-records); returns the tx id, None for an empty batch."""
    if not records:
        return None
    return store.submit_tx(
        [transform_sink_record(r, props) for r in records]
    )


def _committed_op_rows(store, after_tx_id):
    rows = store.tx_log(after_tx_id=after_tx_id, with_ops=True).collect()
    aborted = store.aborted_txs
    return [r for r in rows if r.tx_id not in aborted]


def poll_source_tx_mode(store, after_tx_id: int | None = None) -> list[dict]:
    """One record per committed tx; value = the tx's op list; offset =
    tx id (CruxSourceTask tx mode)."""
    by_tx: dict[int, list] = {}
    for r in _committed_op_rows(store, after_tx_id):
        op = {
            "op": r.op,
            "eid": r.eid,
            "doc": json.loads(r.doc_json) if r.doc_json else None,
        }
        if r.op == "match":
            # tx-mode DOES carry match ops, with the expected doc
            # (test-source-task-tx-mode-edn ":crux.tx/match")
            op["expected"] = (
                json.loads(r.expected_json) if r.expected_json else None
            )
        by_tx.setdefault(int(r.tx_id), []).append(op)
    return [
        {"offset": tx_id, "key": tx_id, "value": ops}
        for tx_id, ops in sorted(by_tx.items())
    ]


def poll_source_doc_mode(store, after_tx_id: int | None = None) -> list[dict]:
    """One record per op, keyed by eid; puts carry the doc, deletes a
    NULL value — the Kafka tombstone convention (CruxSourceTask doc
    mode). Offset = tx id, so a consumer resuming mid-tx re-reads the
    whole tx (Connect's at-least-once contract)."""
    out = []
    for r in _committed_op_rows(store, after_tx_id):
        if r.op == "put":
            out.append(
                {
                    "offset": int(r.tx_id),
                    "key": r.eid,
                    "value": json.loads(r.doc_json),
                }
            )
        elif r.op in ("delete", "evict"):
            out.append({"offset": int(r.tx_id), "key": r.eid, "value": None})
        # match ops emit nothing: they assert state, they don't change it
    return out
