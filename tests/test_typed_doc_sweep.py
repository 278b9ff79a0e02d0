"""r12 verdict #7 — typed-doc sweep of the remaining doc-emitting
surfaces. r12 made entity/history/documents/match/tx-fn/bulk round-trip
typed values (docjson sidecar); this pins the surfaces that were NOT
swept: pull leaves through Catalog.from_store inference, speculative
with_tx / fork_at docs, and the HTTP entity-history EDN wire. The
reference returns its EDN docs verbatim on every one of these paths
(api_test.clj, fork_test.clj, http-server entity-history)."""

import datetime as dt
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from crux_spark.bitemporal.store import TxStore
from crux_spark.catalog import ID_COL as Catalog_ID_COL
from crux_spark.catalog import Catalog


def test_from_store_inference_upgrades_typed_columns(spark):
    """Catalog.from_store with INFERRED schema: json inference sees the
    legacy value bytes (bare strings / numbers), so without the sidecar
    upgrade a query leaf would come back stringified. The sidecar names
    the classes; consistently-tagged top-level columns are cast."""
    store = TxStore(spark)
    store.submit_tx([
        ("put", {"id": "e1", "when": dt.datetime(2024, 1, 2, 3, 4, 5),
                 "day": dt.date(2024, 6, 1), "amt": Decimal("33.40"),
                 "label": "plain"}),
        ("put", {"id": "e2", "when": dt.datetime(2025, 2, 3, 4, 5, 6),
                 "day": dt.date(2025, 7, 2), "amt": Decimal("0.10"),
                 "label": "other"}),
    ])
    store.commit()
    cat = Catalog.from_store(store)
    from crux_spark.datalog import q

    rows = q(cat, {
        "find": ["?e", "?w", "?d", "?a"],
        "keys": ["e", "w", "d", "a"],
        "where": [["?e", ":when", "?w"], ["?e", ":day", "?d"],
                  ["?e", ":amt", "?a"]],
    }).collect()
    by_e = {r.e: r for r in rows}
    assert by_e["e1"].w == dt.datetime(2024, 1, 2, 3, 4, 5)
    assert isinstance(by_e["e1"].w, dt.datetime)
    assert by_e["e1"].d == dt.date(2024, 6, 1)
    assert isinstance(by_e["e1"].d, dt.date)
    assert by_e["e1"].a == Decimal("33.40")
    assert isinstance(by_e["e1"].a, Decimal)
    assert by_e["e2"].a == Decimal("0.10")


def test_pull_returns_typed_leaves(spark):
    """pull() over a from_store catalog: typed leaf values survive into
    the nested struct (the reference's pull returns EDN values,
    pull.clj)."""
    store = TxStore(spark)
    store.submit_tx([
        ("put", {"id": "p1", "name": "Ivan",
                 "joined": dt.datetime(2024, 3, 1, 9, 0),
                 "bal": Decimal("100.25")}),
    ])
    store.commit()
    cat = Catalog.from_store(store, name="people")
    from crux_spark.datalog.pull import pull

    base = spark.createDataFrame([("p1",)], ["e"])
    out = pull(cat, base, "e", "people", [":name", ":joined", ":bal"])
    row = out.collect()[0].pull
    assert row.name == "Ivan"
    assert row.joined == dt.datetime(2024, 3, 1, 9, 0)
    assert isinstance(row.joined, dt.datetime)
    assert row.bal == Decimal("100.25")
    assert isinstance(row.bal, Decimal)


def test_with_tx_speculative_docs_typed(spark):
    """with_tx (speculative fork, query.clj:1896-1913): entity() on the
    fork returns the typed doc; the base store is untouched."""
    store = TxStore(spark)
    store.submit_tx([("put", {"id": "s1", "at": dt.datetime(2024, 1, 1),
                              "amt": Decimal("5.50")})])
    store.commit()
    fork = store.with_tx([
        ("put", {"id": "s1", "at": dt.datetime(2024, 2, 2),
                 "amt": Decimal("6.75")}),
        ("put", {"id": "s2", "day": dt.date(2024, 8, 1),
                 "dur": dt.timedelta(hours=3, microseconds=17)}),
    ])
    f1 = fork.entity("s1")
    assert f1["at"] == dt.datetime(2024, 2, 2)
    assert isinstance(f1["at"], dt.datetime)
    assert f1["amt"] == Decimal("6.75")
    f2 = fork.entity("s2")
    assert f2["day"] == dt.date(2024, 8, 1)
    assert isinstance(f2["day"], dt.date)
    assert f2["dur"] == dt.timedelta(hours=3, microseconds=17)
    # base store unchanged and still typed
    b1 = store.entity("s1")
    assert b1["at"] == dt.datetime(2024, 1, 1)
    assert isinstance(b1["at"], dt.datetime)
    assert b1["amt"] == Decimal("5.50")


def test_fork_at_docs_typed(spark):
    """fork_at (point-in-past speculative base, fork_test.clj): docs read
    through the fork keep their classes."""
    store = TxStore(spark)
    store.submit_tx([("put", {"id": "h1", "v": Decimal("1.10"),
                              "at": dt.datetime(2024, 1, 1)})])
    store.commit()
    tx1 = store.latest_submitted_tx()
    store.submit_tx([("put", {"id": "h1", "v": Decimal("2.20"),
                              "at": dt.datetime(2024, 6, 1)})])
    store.commit()
    past = store.fork_at(tx1)
    doc = past.entity("h1")
    assert doc["v"] == Decimal("1.10") and isinstance(doc["v"], Decimal)
    assert doc["at"] == dt.datetime(2024, 1, 1)
    assert isinstance(doc["at"], dt.datetime)


def test_http_entity_history_edn_docs_typed(spark):
    """GET /_crux/entity-history?with-docs over the EDN wire: each
    version's doc carries real #inst / M values (the JSON wire
    stringifies by design — EDN is the reference-parity surface)."""
    from tests.test_http_api import _edn_req, get  # reuse helpers

    from crux_spark.http import HttpNode
    from crux_spark.node import Node

    node = Node(spark)
    h = HttpNode(node)
    try:
        base = h.url
        _edn_req(base + "/_crux/submit-tx", {":tx-ops": [
            ["put", {":id": "hh", ":at": dt.datetime(2024, 1, 1, 8, 0),
                     ":amt": Decimal("7.25")}]]})
        _edn_req(base + "/_crux/submit-tx", {":tx-ops": [
            ["put", {":id": "hh", ":at": dt.datetime(2024, 2, 1, 8, 0),
                     ":amt": Decimal("8.50")}]]})
        assert get(base + "/_crux/await-tx") == {"aborted": []}
        hist = _edn_req(
            base + "/_crux/entity-history?eid=hh&sort-order=asc&with-docs=true"
        )
        docs = [
            {k.lstrip(":"): v for k, v in e["doc"].items()} for e in hist
        ]
        assert [d["amt"] for d in docs] == [Decimal("7.25"), Decimal("8.50")]
        assert all(isinstance(d["amt"], Decimal) for d in docs)
        assert docs[0]["at"] == dt.datetime(2024, 1, 1, 8, 0)
        assert isinstance(docs[0]["at"], dt.datetime)
    finally:
        h.close()


# -- property corpus over the speculative path -------------------------------

_leaf = st.one_of(
    st.integers(min_value=-(10**15), max_value=10**15),
    st.text(max_size=12),
    st.decimals(allow_nan=False, allow_infinity=False,
                min_value=Decimal("-1e12"), max_value=Decimal("1e12")),
    st.dates(min_value=dt.date(1900, 1, 1), max_value=dt.date(2200, 1, 1)),
    st.datetimes(min_value=dt.datetime(1900, 1, 1),
                 max_value=dt.datetime(2200, 1, 1)),
)

_doc_body = st.dictionaries(
    st.text(min_size=1, max_size=6).filter(
        lambda s: s not in ("id",) and not s.startswith("crux.")
    ),
    st.one_of(_leaf, st.lists(_leaf, max_size=3)),
    max_size=4,
)


@settings(max_examples=10, deadline=None)
@given(_doc_body)
def test_with_tx_property_roundtrip(spark, body):
    """Speculative put of an arbitrary typed doc comes back from the
    fork's entity() equal AND same-typed — no path re-stringifies."""
    store = TxStore(spark)
    fork = store.with_tx([("put", {"id": "px", **body})])
    out = fork.entity("px")
    assert out == {"id": "px", **body}
    for k, v in body.items():
        assert type(out[k]) is type(v), (k, out[k], v)


def test_from_store_skips_cast_on_mixed_untagged_column(spark):
    """r13 advice: the sidecar tag sample only sees docs that CARRY the
    sidecar — a column mixing tagged dates (e1) with untagged plain
    strings (e2) would "agree" on the date tag and the non-ANSI cast
    would silently NULL e2's value. The whole-column try_cast validation
    must skip the cast and keep the legacy string form instead."""
    store = TxStore(spark)
    store.submit_tx([
        ("put", {"id": "e1", "v": dt.date(2024, 6, 1)}),
        ("put", {"id": "e2", "v": "not-a-date"}),
    ])
    store.commit()
    cat = Catalog.from_store(store, name="mixed")
    tbl = cat.table("mixed")
    vals = {r["v"] for r in tbl.select("v").collect()}
    assert None not in vals, "cast silently nulled an untagged value"
    assert "not-a-date" in vals
    assert len(vals) == 2


def test_from_store_skips_decimal_cast_on_precision_loss(spark):
    """decimal(38,12) narrowing would silently round a value with scale
    greater than 12; the precision-loss probe must keep the legacy
    form (no value drift through catalog inference)."""
    store = TxStore(spark)
    store.submit_tx([
        ("put", {"id": "d1", "amt": Decimal("1.2345678901234567")}),
        ("put", {"id": "d2", "amt": Decimal("2.5")}),
    ])
    store.commit()
    cat = Catalog.from_store(store, name="decs")
    tbl = cat.table("decs")
    got = {r[0]: r["amt"] for r in
           tbl.select(Catalog_ID_COL, "amt").collect()}
    d1 = got["d1"]
    # the exact in-scale value must survive; the over-scale one must not
    # have been rounded to 12 places
    assert str(d1).startswith("1.2345678901234"), d1
    assert Decimal(str(got["d2"])) == Decimal("2.5")


def test_from_store_skips_decimal_cast_when_probe_cannot_check(spark):
    """r14 advice: a value with >20 integer digits NULLs the (38,18)
    wide probe (only 20 integer digits fit) while the (38,12) target
    still accepts it — the rounding comparison never sees it, and its
    >12 fractional digits would silently round. Any value the probe
    cannot check must keep the legacy string form."""
    big = Decimal("123456789012345678901234.1234567890123456")
    store = TxStore(spark)
    store.submit_tx([
        ("put", {"id": "d1", "amt": big}),
        ("put", {"id": "d2", "amt": Decimal("2.5")}),
    ])
    store.commit()
    cat = Catalog.from_store(store, name="bigdecs")
    tbl = cat.table("bigdecs")
    got = {r[0]: r["amt"] for r in
           tbl.select(Catalog_ID_COL, "amt").collect()}
    # the column must NOT have been cast (the probe could not validate
    # d1): the full-precision string survives untouched
    assert str(got["d1"]) == str(big), got["d1"]
    assert Decimal(str(got["d2"])) == Decimal("2.5")
