"""Port of the reference's space-tutorial walkthrough
(crux-test/test/crux/space_tutorial_test.clj): the official onboarding
narrative — puts with valid-time ranges, datalog with :args, bitemporal
insurance-timeline slicing, match-guarded trades (whole-tx abort),
valid-time-bounded history + ranged delete, and pull [*] + evict.

Adaptations: keywords are strings; namespaced attrs flatten to plain
column names; entity-history rows compare on (valid_from, deleted, doc)
because tx ids/times are engine-local."""

import datetime as dt

import pytest

from crux_spark.node import Node


def rows(df):
    return {tuple(r) if len(r) > 1 else r[0] for r in df.collect()}


MANIFEST = {
    "id": "manifest",
    "pilot_name": "Johanna",
    "rocket": "SB002-sol",
    "employee": "22910x2",
    "badges": ["SETUP"],
    "cargo": ["stereo", "gold fish", "slippers", "secret note"],
}

MANIFEST_SCHEMA = (
    "pilot_name string, rocket string, employee string,"
    " badges array<string>, cargo array<string>"
)


def test_earth_manifest(spark):
    node = Node(spark, schema=MANIFEST_SCHEMA)
    node.submit_tx([("put", MANIFEST)])
    node.await_tx()
    assert node.db().entity("manifest") == MANIFEST
    # cargo membership via :args over a cardinality-many attribute
    got = node.db().q(
        {
            "find": ["?belongings"],
            "where": [["?e", ":cargo", "?belongings"]],
            "args": [{"?belongings": "secret note"}],
        }
    )
    assert rows(got) == {"secret note"}


STOCK_SCHEMA = "commod string, weight_ton double"


def test_pluto_valid_time_sequences(spark):
    node = Node(spark, schema=STOCK_SCHEMA)
    h = lambda day: dt.datetime(2115, 2, day, 18)
    puts = [
        ("put", {"id": "stock/Pu", "commod": "Pu", "weight_ton": 21.0}, h(13)),
        ("put", {"id": "stock/Pu", "commod": "Pu", "weight_ton": 23.0}, h(14)),
        ("put", {"id": "stock/Pu", "commod": "Pu", "weight_ton": 22.2}, h(15)),
        ("put", {"id": "stock/Pu", "commod": "Pu", "weight_ton": 24.0}, h(18)),
        ("put", {"id": "stock/Pu", "commod": "Pu", "weight_ton": 24.9}, h(19)),
    ]
    node.submit_tx(puts)
    node.await_tx()
    node.submit_tx(
        [
            ("put", {"id": "stock/N", "commod": "N", "weight_ton": 3.0}, h(13), h(19)),
            ("put", {"id": "stock/CH4", "commod": "CH4", "weight_ton": 92.0}, h(15), h(19)),
        ]
    )
    node.await_tx()
    assert node.db(dt.datetime(2115, 2, 14)).entity("stock/Pu")["weight_ton"] == 21.0
    assert node.db(dt.datetime(2115, 2, 18)).entity("stock/Pu")["weight_ton"] == 22.2
    # the ranged puts are visible only inside their windows
    assert node.db(h(14)).entity("stock/N")["weight_ton"] == 3.0
    assert node.db(h(20)).entity("stock/N") is None
    assert node.db(h(14)).entity("stock/CH4") is None
    assert node.db(h(16)).entity("stock/CH4")["weight_ton"] == 92.0


COMMODITY_SCHEMA = (
    "common_name string, type string, density double, radioactive boolean,"
    " iupac string, appearance string, other_names array<string>"
)

COMMODITIES = [
    {"id": "commodity/Pu", "common_name": "Plutonium", "type": "element/metal",
     "density": 19.816, "radioactive": True},
    {"id": "commodity/N", "common_name": "Nitrogen", "type": "element/gas",
     "density": 1.2506, "radioactive": False},
    {"id": "commodity/CH4", "common_name": "Methane", "type": "molecule/gas",
     "density": 0.717, "radioactive": False},
    {"id": "commodity/Au", "common_name": "Gold", "type": "element/metal",
     "density": 19.3, "radioactive": False},
    {"id": "commodity/C", "common_name": "Carbon", "type": "element/non-metal",
     "density": 2.267, "radioactive": False},
    {"id": "commodity/borax", "common_name": "Borax",
     "iupac": "Sodium tetraborate decahydrate",
     "other_names": ["Borax decahydrate", "sodium borate", "sodium tetraborate",
                      "disodium tetraborate"],
     "type": "mineral/solid", "appearance": "white solid",
     "density": 1.73, "radioactive": False},
]


def test_mercury_datalog(spark):
    node = Node(spark, schema=COMMODITY_SCHEMA)
    node.submit_tx([("put", doc) for doc in COMMODITIES])
    node.await_tx()
    db = node.db()
    assert db.entity("commodity/borax")["iupac"] == "Sodium tetraborate decahydrate"
    assert rows(
        db.q({"find": ["?e"], "where": [["?e", ":type", "element/metal"]]})
    ) == {"commodity/Pu", "commodity/Au"}
    assert rows(
        db.q(
            {
                "find": ["?name"],
                "where": [
                    ["?e", ":type", "element/metal"],
                    ["?e", ":common_name", "?name"],
                ],
            }
        )
    ) == {"Gold", "Plutonium"}
    assert rows(
        db.q(
            {
                "find": ["?name", "?rho"],
                "where": [
                    ["?e", ":density", "?rho"],
                    ["?e", ":common_name", "?name"],
                ],
            }
        )
    ) == {
        ("Nitrogen", 1.2506), ("Carbon", 2.267), ("Methane", 0.717),
        ("Borax", 1.73), ("Gold", 19.3), ("Plutonium", 19.816),
    }
    assert rows(
        db.q(
            {
                "find": ["?name"],
                "where": [
                    ["?e", ":common_name", "?name"],
                    ["?e", ":radioactive", True],
                ],
            }
        )
    ) == {"Plutonium"}
    assert rows(
        db.q(
            {
                "find": ["?name"],
                "where": [["?e", ":type", "?t"], ["?e", ":common_name", "?name"]],
                "args": [{"?t": "element/metal"}],
            }
        )
    ) == {"Gold", "Plutonium"}
    assert rows(
        db.q(
            {
                "find": ["?name", "?iupac"],
                "where": [
                    ["?e", ":common_name", "?name"],
                    ["?e", ":iupac", "?iupac"],
                    ["?e", ":appearance", "?appearance"],
                ],
                "args": [{"?appearance": "white solid"}],
            }
        )
    ) == {("Borax", "Sodium tetraborate decahydrate")}


CONSUMER_SCHEMA = "consumer_id string, first_name string, last_name string, cover boolean, cover_type string"


def test_neptune_insurance_timeline(spark):
    node = Node(spark, schema=CONSUMER_SCHEMA)
    i = lambda y, m=12, day=3: dt.datetime(y, m, day)
    jay = {
        "id": "consumer/RJ29sUU", "consumer_id": "RJ29sUU",
        "first_name": "Jay", "last_name": "Rose",
    }
    node.submit_tx([("put", {**jay, "cover": True, "cover_type": "Full"}, i(2114))])
    node.await_tx()
    node.submit_tx(
        [
            ("put", {**jay, "cover": True, "cover_type": "Full"}, i(2113), i(2114)),
            ("put", {**jay, "cover": True, "cover_type": "Full"}, i(2112), i(2113)),
            ("put", {**jay, "cover": False}, i(2112, 6, 3), i(2112, 12, 2)),
            ("put", {**jay, "cover": True, "cover_type": "Promotional"},
             i(2111, 6, 3), i(2112, 6, 3)),
        ]
    )
    node.await_tx()
    spec = {
        "find": ["?cover", "?type"],
        "where": [
            ["?e", ":consumer_id", "RJ29sUU"],
            ["?e", ":cover", "?cover"],
            ["?e", ":cover_type", "?type"],
        ],
    }
    assert rows(node.db(i(2115, 7, 3)).q(spec)) == {(True, "Full")}
    assert node.db(i(2112, 7, 3)).q(spec).count() == 0  # uncovered window
    assert rows(node.db(i(2111, 7, 3)).q(spec)) == {(True, "Promotional")}


TRADE_SCHEMA = (
    "company_name string, seller boolean, buyer boolean, credits long,"
    " units_au long, units_pu long, units_n long, units_ch4 long"
)


def test_saturn_match_trades(spark):
    node = Node(spark, schema=TRADE_SCHEMA)
    gold = {"id": "gold-harmony", "company_name": "Gold Harmony", "seller": True,
            "buyer": False, "units_au": 10211, "credits": 51}
    tomb = {"id": "tombaugh-resources", "company_name": "Tombaugh Resources Ltd.",
            "seller": True, "buyer": False, "units_pu": 50, "units_n": 3,
            "units_ch4": 92, "credits": 51}
    enco = {"id": "encompass-trade", "company_name": "Encompass Trade",
            "seller": True, "buyer": True, "units_au": 10, "units_pu": 5,
            "units_ch4": 211, "credits": 1002}
    blue = {"id": "blue-energy", "seller": False, "buyer": True,
            "company_name": "Blue Energy", "credits": 1000}
    node.submit_tx([("put", d) for d in (gold, tomb, enco, blue)])
    node.await_tx()

    # successful trade: both matches hold, both puts apply
    tx_ok = node.submit_tx(
        [
            ("match", "blue-energy", blue),
            ("put", {**blue, "credits": 900, "units_ch4": 10}),
            ("match", "tombaugh-resources", tomb),
            ("put", {**tomb, "units_ch4": 82, "credits": 151}),
        ]
    )
    assert node.await_tx() == set()
    assert node.db().entity("tombaugh-resources")["units_ch4"] == 82
    assert node.db().entity("tombaugh-resources")["credits"] == 151
    assert node.db().entity("blue-energy")["units_ch4"] == 10

    # failed trade: ONE stale match aborts the WHOLE tx — the matching
    # gold-harmony update rolls back too
    tx_bad = node.submit_tx(
        [
            ("match", "gold-harmony", gold),
            ("put", {**gold, "units_au": 211}),
            ("match", "encompass-trade", {**enco, "credits": 100002}),  # stale
            ("put", {**enco, "units_au": 10010}),
        ]
    )
    assert node.await_tx() == {tx_bad}
    assert node.db().entity("gold-harmony")["units_au"] == 10211
    assert node.db().entity("encompass-trade")["units_au"] == 10


def test_jupiter_history_and_ranged_delete(spark):
    node = Node(spark, schema="clients array<string>")
    t9 = lambda y: dt.datetime(y, 1, 1, 9)
    docs = [
        {"id": "kaarlang/clients", "clients": ["encompass-trade"]},
        {"id": "kaarlang/clients", "clients": ["encompass-trade", "blue-energy"]},
        {"id": "kaarlang/clients", "clients": ["blue-energy"]},
        {"id": "kaarlang/clients",
         "clients": ["blue-energy", "gold-harmony", "tombaugh-resources"]},
    ]
    node.submit_tx(
        [
            ("put", docs[0], t9(2110), t9(2111)),
            ("put", docs[1], t9(2111), t9(2113)),
            ("put", docs[2], t9(2113), t9(2114)),
            ("put", docs[3], t9(2114), t9(2115)),
        ]
    )
    node.await_tx()
    assert node.db(t9(2114)).entity("kaarlang/clients") == docs[3]

    hist = node.store.entity_history("kaarlang/clients")
    # four live versions at their valid-from points, nothing after 2115
    assert [(h["valid_from"], h["deleted"]) for h in hist] == [
        (t9(2110), False), (t9(2111), False), (t9(2113), False), (t9(2114), False),
    ]
    assert [h["doc"]["clients"] for h in hist] == [d["clients"] for d in docs]

    node.submit_tx(
        [("delete", "kaarlang/clients", dt.datetime(2110, 1, 1), dt.datetime(2116, 1, 1))]
    )
    node.await_tx()
    assert node.db(t9(2114)).entity("kaarlang/clients") is None
    hist = node.store.entity_history("kaarlang/clients")
    assert all(h["deleted"] for h in hist)


def test_oumuamua_pull_and_evict(spark):
    node = Node(
        spark,
        schema=(
            "full_name string, origin_planet string, origin_moon string,"
            " identity_tag string, dob string"
        ),
    )
    people = [
        {"id": "person/kaarlang", "full_name": "Kaarlang", "origin_planet": "Mars",
         "identity_tag": "KA01299242093", "dob": "2040-11-23"},
        {"id": "person/ilex", "full_name": "Ilex Jefferson", "origin_planet": "Venus",
         "identity_tag": "IJ01222212454", "dob": "2061-02-17"},
        {"id": "person/thadd", "full_name": "Thad Christover", "origin_moon": "Titan",
         "identity_tag": "IJ01222212454", "dob": "2101-01-01"},
        {"id": "person/johanna", "full_name": "Johanna", "origin_planet": "Earth",
         "identity_tag": "JA012992129120", "dob": "2090-12-07"},
    ]
    node.submit_tx([("put", p) for p in people])
    node.await_tx()
    # full-query: pull [*] over every entity
    full = {p["id"]: node.db().pull(p["id"], ["*"]) for p in people}
    assert full["person/kaarlang"]["full_name"] == "Kaarlang"
    assert full["person/thadd"]["origin_moon"] == "Titan"
    assert full["person/thadd"]["origin_planet"] is None

    node.submit_tx([("evict", "person/kaarlang")])
    node.await_tx()
    assert node.db().entity("person/kaarlang") is None
    assert node.store.entity_history("person/kaarlang") == []
    # other histories intact
    assert node.store.entity_history("person/ilex", ascending=False)
