"""Port of the reference's bitemporal-tale walkthrough
(crux-test/test/crux/bitemporal_tale_test.clj) — the end-to-end
narrative: valid-time puts, datalog over snapshots, ranged delete,
evict, time-travel dbs, match-guarded historic corrections,
re-assertion splicing around later versions, and (valid-time, tx)
double time travel.

Adaptations: keyword ids/attrs are strings; :person/has (a clojure set)
is a sorted list; dates are ISO date strings inside documents and
datetimes for valid-time; the parametrized query's `:args {ids #{...}}`
+ contains? is expressed as a set-literal :in binding."""

import datetime as dt

import pytest

from crux_spark.node import Node

SCHEMA = (
    "name string, born string, location string, strength long, intellect long,"
    " dex long, hp long, gold long, has array<string>, title string,"
    " perks_int long, perks_hp long"
)


def d(y, m=5, day=18):
    return dt.datetime(y, m, day)


def conj(doc, key, *vals):
    out = dict(doc)
    out[key] = sorted(set(out.get(key) or []) | set(vals))
    return out


def disj(doc, key, *vals):
    out = dict(doc)
    out[key] = sorted(set(out.get(key) or []) - set(vals))
    return out


WHO_HAS_WHAT = {
    "find": ["?name", "?atitle"],
    "where": [
        ["?p", ":name", "?name"],
        ["?p", ":has", "?artefact_id"],
        ["?artefact_id", ":title", "?atitle"],
    ],
}


@pytest.fixture(scope="module")
def node(spark):
    n = Node(spark, schema=SCHEMA)

    def put(doc, vt):
        n.submit_tx([("put", doc, vt)])
        n.await_tx()

    put(
        {
            "id": "Charles", "name": "Charles", "born": "1700-05-18",
            "location": "rarities-shop", "strength": 40, "intellect": 40,
            "dex": 40, "hp": 40, "gold": 10000,
        },
        d(1700),
    )
    n.submit_tx(
        [
            (
                "put",
                {
                    "id": "Mary", "name": "Mary", "born": "1710-05-18",
                    "location": "carribean", "strength": 40, "intellect": 50,
                    "dex": 50, "hp": 50,
                },
                d(1710),
            ),
            (
                "put",
                {
                    "id": "Joe", "name": "Joe", "born": "1715-05-18",
                    "location": "city", "strength": 39, "intellect": 40,
                    "dex": 60, "hp": 60, "gold": 70,
                },
                d(1715),
            ),
        ]
    )
    n.await_tx()
    n.submit_tx(
        [
            ("put", {"id": "cozy-mug", "title": "A Rather Cozy Mug", "perks_int": 3}, d(1625)),
            (
                "put",
                {
                    "id": "forbidden-beans", "title": "Magic beans",
                    "perks_int": 30, "perks_hp": -20,
                },
                d(1500),
            ),
            ("put", {"id": "pirate-sword", "title": "A used sword"}, d(1710)),
            ("put", {"id": "flintlock-pistol", "title": "Flintlock pistol"}, d(1710)),
            ("put", {"id": "unknown-key", "title": "Key from an unknown door"}, d(1700)),
            ("put", {"id": "laptop", "title": "A Tell DPS Laptop (what?)"}, d(2016)),
        ]
    )
    n.await_tx()
    return n


def rows(df, one=False):
    out = {tuple(r) if len(r) > 1 else r[0] for r in df.collect()}
    return out


def test_tale_initial_state(node):
    ent = node.db().entity("Charles")
    assert ent["name"] == "Charles" and ent["gold"] == 10000

    db = node.db()
    assert rows(db.q({"find": ["?e"], "where": [["?e", ":name", "Charles"]]})) == {
        "Charles"
    }
    assert rows(
        db.q(
            {
                "find": ["?e", "?name", "?int"],
                "where": [
                    ["?e", ":name", "Charles"],
                    ["?e", ":name", "?name"],
                    ["?e", ":intellect", "?int"],
                ],
            }
        )
    ) == {("Charles", "Charles", 40)}
    assert rows(db.q({"find": ["?t"], "where": [["_", ":title", "?t"]]})) == {
        "Key from an unknown door", "Magic beans", "A used sword",
        "A Rather Cozy Mug", "A Tell DPS Laptop (what?)", "Flintlock pistol",
    }


def test_tale_delete_evict_time_travel(node):
    node.submit_tx([("delete", "forbidden-beans", d(1690))])
    node.await_tx()
    node.submit_tx([("evict", "laptop")])
    node.await_tx()
    assert rows(
        node.db().q({"find": ["?t"], "where": [["_", ":title", "?t"]]})
    ) == {
        "Key from an unknown door", "A used sword",
        "A Rather Cozy Mug", "Flintlock pistol",
    }
    # the world in 1599: only the beans existed (evicted laptop is gone
    # from ALL of history)
    assert rows(
        node.db(d(1599, 1, 1)).q({"find": ["?t"], "where": [["_", ":title", "?t"]]})
    ) == {"Magic beans"}


def first_ownership_ops(node):
    charles = node.db(d(1725, 5, 17)).entity("Charles")
    mary = node.db(d(1715, 5, 17)).entity("Mary")
    return [
        ("put", conj(charles, "has", "cozy-mug", "unknown-key"), d(1725)),
        ("put", conj(mary, "has", "pirate-sword", "flintlock-pistol"), d(1715)),
    ]


def test_tale_ownership_and_corrections(node):
    first_tx = node.submit_tx(first_ownership_ops(node))
    node.await_tx()

    assert rows(node.db(d(1726, 5, 1)).q(WHO_HAS_WHAT)) == {
        ("Mary", "A used sword"),
        ("Mary", "Flintlock pistol"),
        ("Charles", "A Rather Cozy Mug"),
        ("Charles", "Key from an unknown door"),
    }
    assert rows(node.db(d(1716, 5, 1)).q(WHO_HAS_WHAT)) == {
        ("Mary", "A used sword"),
        ("Mary", "Flintlock pistol"),
    }

    # parametrized query: set-valued binding + contains?
    assert rows(
        node.db(d(1726, 5, 1)).q(
            {
                "find": ["?name"],
                "in": ["?ids"],
                "where": [
                    ["?e", ":name", "?name"],
                    [["contains?", "?ids", "?e"]],
                ],
                "limit": 10,
            },
            {"Charles", "Mary"},
        )
    ) == {"Charles", "Mary"}

    # entity-update: Charles gets smarter in 1730
    cur = node.db().entity("Charles")
    node.submit_tx([("put", {**cur, "intellect": 50}, d(1730))])
    node.await_tx()
    ent = node.db().entity("Charles")
    assert ent["intellect"] == 50
    assert sorted(ent["has"]) == ["cozy-mug", "unknown-key"]

    # the theft of 1740: the mug moves from Charles to Mary
    theft = d(1740, 6, 18)
    node.submit_tx(
        [
            ("put", disj(node.db(theft).entity("Charles"), "has", "cozy-mug"), theft),
            ("put", conj(node.db(theft).entity("Mary"), "has", "cozy-mug"), theft),
        ]
    )
    node.await_tx()
    assert rows(node.db(theft).q(WHO_HAS_WHAT)) == {
        ("Mary", "A used sword"),
        ("Mary", "Flintlock pistol"),
        ("Mary", "A Rather Cozy Mug"),
        ("Charles", "Key from an unknown door"),
    }

    # match-guarded historic correction: baby Mary had the mug since 1710
    birth = d(1710)
    baby_mary = node.db(birth).entity("Mary")
    node.submit_tx(
        [
            ("match", "Mary", baby_mary, birth),
            ("put", conj(baby_mary, "has", "cozy-mug"), birth),
        ]
    )
    assert node.await_tx() == set()  # match held

    # ...but she lost it again in 1723
    lost = d(1723, 1, 9)
    mary_1723 = node.db(lost).entity("Mary")
    node.submit_tx(
        [
            ("match", "Mary", mary_1723, lost),
            ("put", disj(mary_1723, "has", "cozy-mug"), lost),
        ]
    )
    assert node.await_tx() == set()

    # at 1715-05-18 the first-ownership version still shows sword+pistol
    assert rows(node.db(d(1715)).q(WHO_HAS_WHAT)) == {
        ("Mary", "A used sword"),
        ("Mary", "Flintlock pistol"),
    }

    # re-running the ownership tx NOW reads the corrected 1715-05-17
    # state (baby Mary WITH the mug) — so the 1715 version gains all three
    node.submit_tx(first_ownership_ops(node))
    node.await_tx()
    assert rows(node.db(d(1715)).q(WHO_HAS_WHAT)) == {
        ("Mary", "A used sword"),
        ("Mary", "Flintlock pistol"),
        ("Mary", "A Rather Cozy Mug"),
    }
    assert rows(node.db(d(1740, 6, 19)).q(WHO_HAS_WHAT)) == {
        ("Mary", "A used sword"),
        ("Mary", "Flintlock pistol"),
        ("Mary", "A Rather Cozy Mug"),
        ("Charles", "Key from an unknown door"),
    }

    # double time travel: as of the FIRST ownership tx, the corrections
    # and the theft have not happened yet
    assert rows(node.db(d(1715, 6, 19), tx=first_tx).q(WHO_HAS_WHAT)) == {
        ("Mary", "A used sword"),
        ("Mary", "Flintlock pistol"),
    }
