"""Bitemporal splice algebra vs the reference's tx semantics
(crux-test/test/crux/tx_test.clj scenarios; tx.clj:59-95 spec).

Pure Python — no Spark session needed.
"""

import datetime as dt
import json

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


def test_put_delete_range_semantics_table():
    """The reference's canonical 9-scenario range-semantics table
    (tx_test.clj:389-495 test-put-delete-range-semantics), checked on
    the (valid-time, value) timeline. The reference's index stores
    point events; this model stores rectangles — `events()` converts:
    one event per current rectangle start, plus a nil event wherever
    the timeline goes dark (range end with nothing following).
    Tx-id attribution of re-instated segments differs by design
    (remainders carry the splicing tx) and is not compared."""

    def events(h):
        cur = sorted(
            (r for r in h if r.tx_to == END_OF_TX),
            key=lambda r: r.valid_from,
        )
        out = []
        for i, r in enumerate(cur):
            val = None
            if r.doc_json and not r.deleted:
                import json

                val = json.loads(r.doc_json)["value"]
            out.append((dt.datetime.fromtimestamp(r.valid_from / 1e6), val))
            nxt = cur[i + 1] if i + 1 < len(cur) else None
            if r.valid_to != END_OF_TIME and (
                nxt is None or nxt.valid_from > r.valid_to
            ):
                out.append((dt.datetime.fromtimestamp(r.valid_to / 1e6), None))
        # collapse adjacent same-value events (rectangle splits at old
        # interior boundaries are one logical value run in the event view
        # ... except the reference KEEPS those interior events, so only
        # collapse exact duplicates)
        return out

    def day(n):
        return dt.datetime(2019, 11, n)

    scenarios = [
        # (ops [(value, vt, end_vt?)...], expected [(vt, value)...])
        ([(26, 26, 29)], [(26, 26), (29, None)]),
        # re-instates the previous value at the end of the range
        ([(25, 25, None), (26, 26, 29)], [(25, 25), (26, 26), (29, 25)]),
        # delete a range
        ([(25, 25, None), (None, 26, 29)], [(25, 25), (26, None), (29, 25)]),
        # override a range
        (
            [(25, 25, 27), (None, 25, 27), (26, 26, 29)],
            [(25, None), (26, 26), (27, 26), (29, None)],
        ),
        # merge a range
        (
            [(25, 25, 27), (26, 26, 29)],
            [(25, 25), (26, 26), (27, 26), (29, None)],
        ),
        # shouldn't override the value at end-vt if there's one there
        (
            [(25, 25, None), (29, 29, None), (26, 26, 29)],
            [(25, 25), (26, 26), (29, 29)],
        ),
        # should re-instate 28 at the end of the range
        (
            [(25, 25, None), (28, 28, None), (26, 26, 29)],
            [(25, 25), (26, 26), (28, 26), (29, 28)],
        ),
        # 26.1 should overwrite the full range
        (
            [(28, 28, None), (26, 26, 29), (26.1, 26, None)],
            [(26, 26.1), (28, 26.1), (29, 28)],
        ),
        # 27 should override the latter half of the range
        (
            [(25, 25, None), (26, 26, 29), (27, 27, None)],
            [(25, 25), (26, 26), (27, 27), (29, 25)],
        ),
        # 27 should still override the latter half of the range
        (
            [(25, 25, None), (28, 28, None), (26, 26, 29), (27, 27, None)],
            [(25, 25), (26, 26), (27, 27), (28, 27), (29, 28)],
        ),
    ]
    for ops, want in scenarios:
        h = []
        for tx_id, (value, vt, end) in enumerate(ops):
            endt = day(end) if end else None
            if value is None:
                h = delete(h, tx_id, day(vt), valid_from=day(vt), valid_to=endt)
            else:
                h = put(
                    h,
                    {"id": "ivan", "value": value},
                    tx_id,
                    day(vt),
                    valid_from=day(vt),
                    valid_to=endt,
                )
        got = [(e[0], e[1]) for e in events(h)]
        want_t = [(day(v), val) for v, val in want]
        assert got == want_t, f"ops={ops}\n got={got}\nwant={want_t}"


def test_unranged_run_stops_at_different_origin_tx():
    """Mined by the generative rectangle property: two adjacent
    tombstones from DIFFERENT txs sharing a tx_time must NOT merge into
    one run — the reference's take-while key is (tx-time, tx-id,
    content-hash), so an unranged put at the first tombstone overwrites
    only [0, 1), not both."""
    from crux_spark.bitemporal import splice as sp

    hist = []
    hist = sp.delete(hist, 1, 0, 0, None)      # tx1: tombstone [0, inf)
    hist = sp.delete(hist, 2, 0, 0, 1000)      # tx2: tombstone [0, 1)
    hist = sp.put(hist, {"id": "e", "v": 2}, 3, 0, 0, None)  # unranged

    got = sp.as_of(hist, 0)
    assert got is not None and '"v": 2' in got.doc_json
    # the put covered ONLY tx2's [0,1) run; tx1's tombstone resumes at 1
    assert sp.as_of(hist, 1000) is None
    assert sp.as_of(hist, 5000) is None


def test_bitemporal_invariants_random_streams():
    """Property test over random put/delete streams (ranged + unranged):

    1. TX IMMUTABILITY — once tx T applies, every (valid-time, T)
       answer is frozen: later txs never change a past tx slice.
    2. UNIQUE COVERAGE — at every (vt, tx) point at most ONE version
       rectangle is current (no double-belief).
    3. REDUNDANCY-FREE VISIBILITY — as_of returns exactly the covering
       rectangle's doc (cross-checked via raw rectangle scan).

    These are semantic invariants of any correct bitemporal splice —
    independent of the overwrite-run rule's internals, so they
    complement the example-based canonical table above."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from crux_spark.bitemporal import splice
    from crux_spark.bitemporal.splice import END_OF_TX

    VTS = list(range(0, 14)) + [1000]  # probe grid incl. far future

    ops_strategy = st.lists(
        st.tuples(
            st.sampled_from(["put", "delete"]),
            st.integers(min_value=0, max_value=12),            # vf
            st.one_of(st.none(), st.integers(min_value=1, max_value=13)),  # vt_end
            st.integers(min_value=0, max_value=3),             # doc value
        ),
        min_size=1,
        max_size=10,
    )

    @settings(
        max_examples=300,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(ops_strategy)
    def check(ops):
        history = []
        slices = {}  # tx -> {vt: visible value or None}
        for i, (kind, vf, vt_end, val) in enumerate(ops):
            tx = i + 1
            if vt_end is not None and vt_end <= vf:
                vt_end = vf + 1
            if kind == "put":
                history = splice.put(
                    history, {"v": val}, tx, tx, vf, vt_end
                )
            else:
                history = splice.delete(history, tx, tx, vf, vt_end)
            slices[tx] = {
                vt: (lambda r: None if r is None else json.loads(r.doc_json)["v"])(
                    splice.as_of(history, vt, tx=tx)
                )
                for vt in VTS
            }
        # 1. tx immutability against the FINAL history
        for tx, snap in slices.items():
            for vt, want in snap.items():
                r = splice.as_of(history, vt, tx=tx)
                got = None if r is None else json.loads(r.doc_json)["v"]
                assert got == want, (tx, vt, got, want, ops)
        # 2. unique coverage at every probed point
        for tx in slices:
            for vt in VTS:
                covering = [
                    r
                    for r in history
                    if r.valid_from <= vt < r.valid_to
                    and r.tx_from <= tx < r.tx_to
                ]
                assert len(covering) <= 1, (tx, vt, covering, ops)
                # 3. as_of agrees with the raw rectangle scan
                r = splice.as_of(history, vt, tx=tx)
                if covering and not covering[0].deleted:
                    assert r is covering[0]
                else:
                    assert r is None
        # current rectangles never extend past END_OF_TX bookkeeping
        assert all(r.tx_to <= END_OF_TX for r in history)

    check()
