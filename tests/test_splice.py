"""Bitemporal splice algebra vs the reference's tx semantics
(crux-test/test/crux/tx_test.clj scenarios; tx.clj:59-95 spec).

Pure Python — no Spark session needed.
"""

import datetime as dt

from crux_spark.bitemporal.splice import (
    END_OF_TIME,
    END_OF_TX,
    as_of,
    delete,
    entity_history,
    evict,
    matches,
    put,
)


def t(day, hour=0):
    return dt.datetime(2020, 1, day, hour)


def doc(v):
    return {"id": "e1", "v": v}


def test_simple_put_visible_from_vt():
    h = put([], doc(1), tx_id=1, tx_time=t(5))
    assert as_of(h, t(4)) is None
    got = as_of(h, t(5))
    assert got and not got.deleted
    assert as_of(h, t(20)).content_hash == got.content_hash


def test_put_preserves_future_versions():
    # put v1@d10, then put v2@d5 — v2 covers [d5, d10) only (tx.clj:66-75)
    h = put([], doc(1), 1, t(10), valid_from=t(10))
    h = put(h, doc(2), 2, t(11), valid_from=t(5))
    assert as_of(h, t(7)).doc_json == '{"id": "e1", "v": 2}'
    assert as_of(h, t(12)).doc_json == '{"id": "e1", "v": 1}'
    assert as_of(h, t(4)) is None


def test_ranged_put_resumes_old_content():
    h = put([], doc(1), 1, t(1), valid_from=t(1))
    h = put(h, doc(2), 2, t(2), valid_from=t(5), valid_to=t(10))
    assert as_of(h, t(3)).doc_json.endswith('"v": 1}')
    assert as_of(h, t(7)).doc_json.endswith('"v": 2}')
    assert as_of(h, t(10)).doc_json.endswith('"v": 1}')  # old content resumes


def test_correction_keeps_old_tx_view():
    h = put([], doc(1), 1, t(1), valid_from=t(1))
    h = put(h, doc(2), 2, t(2), valid_from=t(1))  # correction at same vt
    # current belief: v2
    assert as_of(h, t(1)).doc_json.endswith('"v": 2}')
    # as of tx 1 (before correction): v1
    assert as_of(h, t(1), tx=1).doc_json.endswith('"v": 1}')


def test_delete_tombstone_and_resume():
    h = put([], doc(1), 1, t(1), valid_from=t(1))
    h = delete(h, 2, t(2), valid_from=t(5), valid_to=t(8))
    assert as_of(h, t(3)) is not None
    assert as_of(h, t(6)) is None
    assert as_of(h, t(9)) is not None


def test_delete_without_end_covers_to_next_boundary():
    h = put([], doc(1), 1, t(1), valid_from=t(1))
    h = put(h, doc(2), 2, t(2), valid_from=t(10))
    h = delete(h, 3, t(3), valid_from=t(5))
    assert as_of(h, t(6)) is None  # deleted in [5, 10)
    assert as_of(h, t(11)).doc_json.endswith('"v": 2}')  # future preserved


def test_put_into_deleted_gap_boundary():
    # boundaries left by tombstones must bound later unranged puts
    h = put([], doc(1), 1, t(1), valid_from=t(1))
    h = delete(h, 2, t(2), valid_from=t(10))
    h = put(h, doc(3), 3, t(3), valid_from=t(5))
    assert as_of(h, t(7)).doc_json.endswith('"v": 3}')
    assert as_of(h, t(11)) is None  # delete at d10 still in effect


def test_match_semantics():
    h = put([], doc(1), 1, t(1), valid_from=t(1))
    assert matches(h, doc(1), t(2))
    assert not matches(h, doc(2), t(2))
    assert matches(h, None, dt.datetime(2019, 12, 31))  # absent before valid_from
    h2 = delete(h, 2, t(2), valid_from=t(2))
    assert matches(h2, None, t(3))


def test_evict_removes_everything():
    h = put([], doc(1), 1, t(1), valid_from=t(1))
    h = put(h, doc(2), 2, t(2), valid_from=t(2))
    assert evict(h) == []


def test_history_with_and_without_corrections():
    h = put([], doc(1), 1, t(1), valid_from=t(1))
    h = put(h, doc(2), 2, t(2), valid_from=t(1))  # correction
    h = put(h, doc(3), 3, t(3), valid_from=t(5))
    from crux_spark.bitemporal.splice import to_us

    cur = entity_history(h)
    assert [(v.valid_from, v.doc_json[-2]) for v in cur] == [
        (to_us(t(1)), "2"),
        (to_us(t(5)), "3"),
    ]
    allv = entity_history(h, with_corrections=True)
    assert len(allv) == 3
    desc = entity_history(h, ascending=False)
    assert desc[0].valid_from == to_us(t(5))


def test_unranged_put_extends_to_end_of_time():
    h = put([], doc(1), 1, t(1), valid_from=t(1))
    cur = entity_history(h)
    assert cur[0].valid_to == END_OF_TIME
    assert cur[0].tx_to == END_OF_TX
