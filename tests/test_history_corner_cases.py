"""tx_test.clj history corner cases: same-millisecond txs (bug 441) and
the combined valid-time + tx-id bound matrix
(test-entity-history-seq-corner-cases)."""

import datetime as dt

from crux_spark.bitemporal.store import TxStore


def _h(store, eid, ascending, corrections=False, **kw):
    return [
        (h["valid_from"], h["tx_from"], h["doc"]["value"])
        for h in store.entity_history(
            eid, ascending=ascending, with_corrections=corrections, **kw
        )
    ]


def test_multiple_txs_in_same_ms_441(spark):
    t = dt.datetime(2019, 11, 29)
    store = TxStore(spark)
    store.submit_tx([("put", {"id": "ivan", "value": 1}, t)], tx_time=t)  # tx1
    store.submit_tx([("put", {"id": "ivan", "value": 2}, t)], tx_time=t)  # tx2
    store.commit()

    # corrections view: both versions at the same instant, tx-id ordered
    assert _h(store, "ivan", False, corrections=True) == [(t, 2, 2), (t, 1, 1)]

    # pinning the tx-id start disambiguates the shared wall-clock instant
    assert _h(store, "ivan", False, start_valid_time=t, start_tx_id=2) == [(t, 2, 2)]
    assert _h(store, "ivan", False, start_valid_time=t, start_tx_id=1) == [(t, 1, 1)]
    assert _h(store, "ivan", True, start_valid_time=t) == [(t, 2, 2)]


def test_entity_history_seq_corner_cases(spark):
    t1 = dt.datetime(2020, 5, 1)
    t2 = dt.datetime(2020, 5, 2)
    store = TxStore(spark)
    # tx1 at t1: value 1 valid from t1
    store.submit_tx([("put", {"id": "ivan", "value": 1}, t1)], tx_time=t1)
    # tx2 at t2: value 2 valid from t1 (correction) AND value 2 valid from t2
    store.submit_tx(
        [("put", {"id": "ivan", "value": 2}, t1),
         ("put", {"id": "ivan", "value": 2}, t2)],
        tx_time=t2,
    )
    store.commit()

    v1_t1 = (t1, 1, 1)
    v1_t2 = (t1, 2, 2)
    v2_t2 = (t2, 2, 2)

    # start is inclusive
    assert _h(store, "ivan", False, start_valid_time=t2, start_tx_id=2) == [v2_t2, v1_t2]
    assert _h(store, "ivan", False, start_valid_time=t1) == [v1_t2]
    assert _h(store, "ivan", True, start_tx_id=2) == [v1_t2, v2_t2]
    assert _h(
        store, "ivan", True, corrections=True, start_tx_id=1, start_valid_time=t1
    ) == [v1_t1, v1_t2, v2_t2]

    # end is exclusive
    assert _h(
        store, "ivan", False,
        start_valid_time=t2, start_tx_id=2, end_valid_time=t1, end_tx_id=1,
    ) == [v2_t2]
    assert _h(store, "ivan", False, end_valid_time=t2) == []
    assert _h(store, "ivan", True, end_tx_id=2) == [v1_t1]
    assert _h(store, "ivan", True, start_valid_time=t1, end_tx_id=1) == []
