"""Typed document round trips (bitemporal/docjson.py) — the reference
stores EDN docs, so entity() returns exactly what put() submitted
(api_test.clj round-trips #inst values); here a reserved sidecar key
carries the type tags while every VALUE keeps its legacy stringified
bytes, so from_json-with-DDL consumers are unaffected."""

import datetime as dt
import json
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from crux_spark.bitemporal.docjson import (
    TYPES_KEY,
    decode_doc,
    doc_dumps,
    doc_loads,
    encode_doc,
)
from crux_spark.valuetypes import BigInt, BigInteger, Char, Instant, LocalDateTime


def test_roundtrip_every_class():
    doc = {
        "id": "e1",
        "when": dt.datetime(2024, 1, 2, 3, 4, 5, 123456),
        "day": dt.date(2024, 6, 1),
        "tod": dt.time(13, 30, 59),
        "dur": dt.timedelta(days=1, hours=2, microseconds=7),
        "amt": Decimal("12.50"),
        "c": Char("m"),
        "big": BigInt(10**30),
        "bigz": BigInteger(-(10**25)),
        "at": Instant(2024, 4, 1, 12, 0),
        "ldt": LocalDateTime(2024, 3, 1, 7, 30),
        "n": 42,
        "f": 1.5,
        "s": "plain",
        "none": None,
        "flag": True,
    }
    out = doc_loads(doc_dumps(doc))
    assert out == doc
    for k in doc:
        assert type(out[k]) is type(doc[k]), k


def test_value_bytes_are_legacy_stringified():
    """Every value in the encoded JSON must be byte-identical to the
    legacy json.dumps(..., default=str) form — SQL-over-docs consumers
    parse doc_json with user DDL and only bare strings parse."""
    doc = {"id": "e", "ts": dt.datetime(2024, 1, 2, 3, 4, 5),
           "d": dt.date(2024, 6, 1), "amt": Decimal("9.75")}
    enc = json.loads(doc_dumps(doc))
    legacy = json.loads(json.dumps(doc, sort_keys=True, default=str))
    for k in doc:
        assert enc[k] == legacy[k], k
    assert TYPES_KEY in enc


def test_untagged_doc_passes_through():
    # bulk_ingest to_json docs / legacy data carry no sidecar
    assert doc_loads('{"id": "e", "v": "2024-01-01 00:00:00"}') == {
        "id": "e", "v": "2024-01-01 00:00:00"}


def test_encode_idempotent_and_hash_invariant():
    """content_hash(original) == content_hash(json.loads(doc_json)) —
    the norm-UDF invariant (store.py _bulk_put_versions)."""
    from crux_spark.bitemporal.splice import content_hash

    doc = {"id": "e", "when": dt.datetime(2024, 1, 1),
           "xs": [Decimal("1.5"), {"deep": dt.date(2020, 1, 1)}]}
    enc = json.loads(doc_dumps(doc))
    assert encode_doc(enc) is enc  # idempotent
    assert content_hash(doc) == content_hash(enc)
    # and re-dumping the loaded form is byte-identical
    assert json.dumps(enc, sort_keys=True, default=str) == doc_dumps(doc)


def test_nested_paths_and_sets():
    doc = {
        "id": "e",
        "nested": {"deep": [dt.date(2020, 1, 1), {"x": Decimal("2")}]},
        "tags": {"b", "a"},
        "typed_set": {dt.date(2024, 1, 1), dt.date(2024, 1, 2)},
        "tuple_set": {(1, 2), (3, 4)},
    }
    out = doc_loads(doc_dumps(doc))
    assert out["nested"]["deep"][0] == dt.date(2020, 1, 1)
    assert out["nested"]["deep"][1]["x"] == Decimal("2")
    assert out["tags"] == {"a", "b"}
    assert out["typed_set"] == {dt.date(2024, 1, 1), dt.date(2024, 1, 2)}
    assert out["tuple_set"] == {(1, 2), (3, 4)}


_typed_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(), st.text(max_size=20),
    st.floats(allow_nan=False, allow_infinity=False),
    st.decimals(allow_nan=False, allow_infinity=False),
    st.dates(),
    st.datetimes(min_value=dt.datetime(1, 1, 1),
                 max_value=dt.datetime(9999, 12, 28)),
    st.times(),
    st.timedeltas(min_value=dt.timedelta(days=-10**5),
                  max_value=dt.timedelta(days=10**5)),
    st.builds(Char, st.characters(blacklist_categories=("Cs",))),
    st.builds(BigInt, st.integers()),
)

_typed_values = st.recursive(
    _typed_scalars,
    lambda kids: st.one_of(
        st.lists(kids, max_size=4),
        st.dictionaries(
            st.text(max_size=8).filter(lambda s: s != TYPES_KEY),
            kids, max_size=3),
    ),
    max_leaves=12,
)


@settings(max_examples=250, deadline=None)
@given(st.dictionaries(
    st.text(min_size=1, max_size=8).filter(lambda s: s != TYPES_KEY),
    _typed_values, max_size=5))
def test_docjson_property_roundtrip(doc):
    out = doc_loads(doc_dumps(doc))
    assert out == doc
    _same_types(out, doc)


def _same_types(a, b):
    assert type(a) is type(b), (a, b)
    if isinstance(b, dict):
        for k in b:
            _same_types(a[k], b[k])
    elif isinstance(b, list):
        for x, y in zip(a, b):
            _same_types(x, y)


def test_store_round_trip_and_ddl_compat(spark):
    """End-to-end: put typed doc -> entity() typed; the SAME doc_json
    parses with user DDL through register_snapshot (the stringified
    value bytes are what 'ts timestamp' needs)."""
    from crux_spark.bitemporal.store import TxStore
    from crux_spark.sql import temporal_view

    store = TxStore(spark)
    doc = {"id": "e1", "ts": dt.datetime(2024, 1, 2, 3, 4, 5),
           "bal": Decimal("10.25"), "n": 7}
    store.submit_tx([("put", doc)], tx_time=dt.datetime(2024, 1, 2))
    store.commit()

    out = store.entity("e1")
    assert out == doc and isinstance(out["ts"], dt.datetime)
    assert isinstance(out["bal"], Decimal)

    temporal_view(store, "docs_ddl",
                  schema="id string, ts timestamp, bal decimal(10,2), n long")
    row = spark.sql("SELECT ts, bal, n FROM docs_ddl").first()
    assert row.ts == dt.datetime(2024, 1, 2, 3, 4, 5)
    assert row.bal == Decimal("10.25") and row.n == 7

    # history docs decode too
    hist = store.entity_history("e1")
    assert hist[0]["doc"]["ts"] == dt.datetime(2024, 1, 2, 3, 4, 5)


def test_inferred_catalog_drops_sidecar(spark):
    """Catalog.from_store with inferred schema must not surface the
    reserved sidecar key as an attribute."""
    from crux_spark.bitemporal.store import TxStore
    from crux_spark.catalog import Catalog

    store = TxStore(spark)
    store.submit_tx([("put", {"id": "e1", "ts": dt.datetime(2024, 1, 1),
                              "v": 1})])
    store.commit()
    cat = Catalog.from_store(store, name="docs_inf")
    cols = cat.table("docs_inf").columns
    assert TYPES_KEY not in cols
    assert "v" in cols


def test_match_with_typed_expected_doc(spark):
    """match compares the canonicalized encoded forms — a typed
    expected doc matches the stored typed doc (and a differing one
    aborts)."""
    from crux_spark.bitemporal.store import TxStore

    store = TxStore(spark)
    doc = {"id": "e1", "when": dt.datetime(2024, 1, 1), "v": 1}
    store.submit_tx([("put", doc)])
    store.commit()
    store.submit_tx([("match", "e1", doc), ("put", {"id": "e1", "v": 2})])
    assert store.commit() == set()
    assert store.entity("e1") == {"id": "e1", "v": 2}
    bad = {"id": "e1", "when": dt.datetime(2024, 1, 2), "v": 1}
    tid = store.submit_tx([("match", "e1", bad), ("put", {"id": "e1", "v": 3})])
    assert store.commit() == {tid}
    assert store.entity("e1") == {"id": "e1", "v": 2}


def test_bulk_ingest_typed_round_trip(spark):
    """bulk_ingest docs round-trip typed too: the sidecar is a
    schema-constant literal appended Spark-side (no per-row Python).
    to_json emits ISO 'T'/'Z' timestamps; decode normalizes to the
    store's naive-UTC convention, so entity() output matches the
    op-path shape."""
    from pyspark.sql import functions as F

    from crux_spark.bitemporal.store import TxStore

    rows = spark.range(3).select(
        F.concat(F.lit("b"), F.col("id")).alias("eid"),
        (F.col("id") * 10).alias("v"),
        F.to_timestamp(F.lit("2024-01-02 03:04:05")).alias("ts"),
        F.to_date(F.lit("2024-06-01")).alias("day"),
        F.lit("9.75").cast("decimal(10,2)").alias("amt"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("vf"),
    )
    store = TxStore(spark)
    store.bulk_ingest(rows, "eid", ["eid", "v", "ts", "day", "amt"], "vf")
    out = store.entity("b1")
    import datetime as dt
    from decimal import Decimal

    assert out["v"] == 10
    assert out["ts"] == dt.datetime(2024, 1, 2, 3, 4, 5)
    assert out["day"] == dt.date(2024, 6, 1)
    assert out["amt"] == Decimal("9.75")


def test_tx_fn_sees_typed_docs(spark):
    """A transaction function reads the CURRENT doc via the db value and
    emits ops computed from it (tx.clj:178-227); with typed docs the fn
    must receive real datetimes/Decimals, and its emitted doc's typed
    values must round-trip again."""
    from crux_spark.bitemporal.store import TxStore

    store = TxStore(spark)
    store.submit_tx([("put", {"id": "acct", "bal": Decimal("100.00"),
                              "opened": dt.datetime(2024, 1, 1)})])
    store.commit()

    def add_interest(db, rate):
        doc = db.entity("acct")
        assert isinstance(doc["bal"], Decimal), doc["bal"]
        assert isinstance(doc["opened"], dt.datetime)
        return [("put", {**doc, "bal": doc["bal"] * Decimal(rate),
                         "adjusted": dt.datetime(2024, 6, 1)})]

    store.register_tx_fn("add-interest", add_interest)
    store.submit_tx([("fn", "add-interest", "1.05")])
    store.commit()
    out = store.entity("acct")
    assert out["bal"] == Decimal("105.0000")
    assert out["adjusted"] == dt.datetime(2024, 6, 1)
    assert out["opened"] == dt.datetime(2024, 1, 1)


def test_bulk_ingest_non_binary_exact_decimal(spark):
    """r12 advice: bulk-ingest doc_json carries decimals as JSON numbers
    (Spark to_json), so json.loads yields a FLOAT; Decimal(float) would
    expose the binary approximation (33.40 -> 33.3999...). The decoder
    must go through str(float) — the shortest round-trip form — so a
    non-binary-exact value survives the typed round trip."""
    from pyspark.sql import functions as F

    from crux_spark.bitemporal.store import TxStore

    rows = spark.range(1).select(
        F.lit("dx").alias("eid"),
        F.lit("33.40").cast("decimal(10,2)").alias("amt"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("vf"),
    )
    store = TxStore(spark)
    store.bulk_ingest(rows, "eid", ["eid", "amt"], "vf")
    out = store.entity("dx")
    assert isinstance(out["amt"], Decimal)
    assert out["amt"] == Decimal("33.40")
    # the corruption signature: more than a handful of fractional digits
    assert len(str(out["amt"])) <= len("33.40")


def test_bulk_ingest_all_null_doc_cols(spark):
    """r12 advice: a row whose doc_cols are ALL null serializes as '{}'
    (to_json ignoreNullFields default); the sidecar concat must produce
    well-formed JSON ('{' + sidecar, no leading comma) rather than the
    malformed '{,"crux.json/types": ...}' that crashed entity()."""
    from pyspark.sql import functions as F

    from crux_spark.bitemporal.store import TxStore

    rows = spark.range(2).select(
        F.concat(F.lit("n"), F.col("id")).alias("key"),
        F.when(F.col("id") == 0, F.to_timestamp(F.lit("2024-01-02 03:04:05")))
        .otherwise(F.lit(None).cast("timestamp")).alias("ts"),
        F.lit(None).cast("decimal(10,2)").alias("amt"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("vf"),
    )
    store = TxStore(spark)
    # doc_cols exclude the id, so the id=1 row's doc is all-null -> '{}'
    store.bulk_ingest(rows, "key", ["ts", "amt"], "vf")
    full = store.entity("n0")
    assert full["ts"] == dt.datetime(2024, 1, 2, 3, 4, 5)
    empty = store.entity("n1")  # must not raise on json.loads
    assert empty is not None
    assert empty.get("ts") is None and empty.get("amt") is None


def test_set_tie_sort_is_deterministic():
    """r12 advice: two distinct set elements with identical ENCODINGS
    (datetime(2024,1,1) vs the string '2024-01-01 00:00:00') must order
    deterministically — the sort key includes the tag list, so the
    canonical dump (and content_hash) no longer depends on set
    iteration order."""
    from crux_spark.bitemporal.splice import content_hash

    a = dt.datetime(2024, 1, 1)
    b = "2024-01-01 00:00:00"
    assert str(a) == b  # the tie this guards against
    d1 = {"id": "e", "s": {a, b}}
    s2 = set()
    s2.add(b)
    s2.add(a)
    d2 = {"id": "e", "s": s2}
    assert doc_dumps(d1) == doc_dumps(d2)
    assert content_hash(d1) == content_hash(d2)
    # the tagged (datetime) element sorts BEFORE the bare string with an
    # equal encoding ('[[' < '[]' in the tag-list JSON): sidecar paths
    # are positional, so pin the canonical order itself
    enc = encode_doc(d1)
    tagged_positions = [p[-1] for p, t, *x in enc[TYPES_KEY] if t == "inst"]
    assert tagged_positions == [0]
    out = doc_loads(doc_dumps(d1))
    assert out["s"] == {a, b}
    assert {type(e) for e in out["s"]} == {dt.datetime, str}


def test_match_falls_back_to_legacy_hash():
    """r12 advice: a doc stored BEFORE the typed-sidecar upgrade holds
    the legacy (untagged) content hash; a WAL-only restore carries no
    index-version stamp, so a post-upgrade match op with a typed
    expected doc must fall back to the legacy hash instead of
    spuriously aborting."""
    import hashlib

    from crux_spark.bitemporal.splice import END_OF_TX, Version, matches

    doc = {"id": "e1", "when": dt.datetime(2024, 1, 2, 3, 4, 5),
           "amt": Decimal("9.75")}
    legacy_hash = hashlib.sha1(
        json.dumps(doc, sort_keys=True, default=str).encode()
    ).hexdigest()
    v1_doc_json = json.dumps(doc, sort_keys=True, default=str)
    hist = [Version(valid_from=0, valid_to=2**62, tx_from=1,
                    tx_to=END_OF_TX, tx_time=1, doc_json=v1_doc_json,
                    deleted=False, content_hash=legacy_hash,
                    legacy_hash=True)]
    assert matches(hist, doc, 10, 10)          # typed expected, v1 store
    assert not matches(hist, {**doc, "amt": Decimal("1.00")}, 10, 10)


def test_match_legacy_fallback_gated_on_provenance():
    """r13 advice: the legacy fallback must NOT fire for rows written by
    a typed build (legacy_hash=False). json.dumps default=str collapses
    datetime(2024,1,2,3,4,5) and the string "2024-01-02 03:04:05" to
    identical bytes, so without the gate a typed expected doc would CAS
    against a stored doc that merely STRINGIFIES the same."""
    import hashlib

    from crux_spark.bitemporal.splice import (END_OF_TX, Version, content_hash,
                                              matches)

    stored = {"id": "e1", "when": "2024-01-02 03:04:05"}  # a real STRING
    hist = [Version(valid_from=0, valid_to=2**62, tx_from=1,
                    tx_to=END_OF_TX, tx_time=1,
                    doc_json=json.dumps(stored, sort_keys=True),
                    deleted=False, content_hash=content_hash(stored),
                    legacy_hash=False)]
    typed_expected = {"id": "e1", "when": dt.datetime(2024, 1, 2, 3, 4, 5)}
    # same legacy bytes — but the stored value is a string, not a datetime
    assert hashlib.sha1(
        json.dumps(typed_expected, sort_keys=True, default=str).encode()
    ).hexdigest() == hashlib.sha1(
        json.dumps(stored, sort_keys=True, default=str).encode()
    ).hexdigest()
    assert not matches(hist, typed_expected, 10, 10)
    assert matches(hist, stored, 10, 10)  # the true string doc still CASes


def test_legacy_hash_provenance_survives_state_round_trip(spark):
    """A hash-less op row (pre-typed WAL) replayed through apply_ops_df
    back-computes its hash and is stamped legacy_hash=True in the
    versions state; a put written by THIS build (submit-time hash)
    stamps False. The flag persists across batches (VERSIONS_SCHEMA
    round trip), so a later match replay still knows which rows may use
    the tolerant fallback."""
    from crux_spark.bitemporal.splice import to_us
    from crux_spark.bitemporal.store import OPS_SCHEMA, TxStore

    doc = {"id": "e1", "when": dt.datetime(2024, 1, 2, 3, 4, 5)}
    legacy_json = json.dumps(doc, sort_keys=True, default=str)
    ts = to_us(dt.datetime(2024, 1, 1))
    ops = spark.createDataFrame(
        [("e1", 1, 0, "put", ts, legacy_json, None, None, None, None, None)],
        OPS_SCHEMA,
    )
    store = TxStore(spark)
    store.apply_ops_df(ops)  # batch 1: the hash-less legacy row
    store.submit_tx([("put", {"id": "e2", "v": 1})],
                    tx_time=dt.datetime(2024, 1, 2))
    store.commit()           # batch 2: a current-build row (hash recorded)
    flags = {r["eid"]: r["legacy_hash"]
             for r in store.versions.select("eid", "legacy_hash").collect()}
    assert flags["e1"] is True, "back-computed hash must stamp legacy"
    assert flags["e2"] is False, "submit-time hash must stamp strict"
