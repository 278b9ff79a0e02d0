"""Port of the reference's SQL-adapter corpus
(crux-sql/test/crux/calcite_test.clj) onto the sql_tables_q flow:
table-mapping documents stored in the db + the temporal prefix +
Spark SQL executing the bare query.

Adaptations (documented divergences):
- ids are plain strings (no keyword type): ``:human/ivan`` ->
  ``"human/ivan"``; the KEYWORD()/UUID() cast functions become plain
  string literals.
- Calcite plan strings are replaced by Spark plan checks where the shape
  matters (single scan for single-entity tables).
- nil attribute values are absent attributes in the wide-column model;
  the IS NULL scenarios run through the crux.sql.table/nullable-columns
  extension (see sql.py _compile_table_spec).
"""

import datetime as dt

import pytest

from crux_spark.bitemporal.store import TxStore
from crux_spark.sql import parse_instant, register_sql_tables, sql_tables_q

PERSON_SCHEMA = (
    "id string, name string, homeworld string, age long, alive boolean"
)

PERSON_TABLE_DOC = {
    "id": "crux.sql.schema/person",
    "crux.sql.table/name": "person",
    "crux.sql.table/query": {
        "find": ["?id", "?name", "?homeworld", "?age", "?alive"],
        "where": [
            ["?id", ":name", "?name"],
            ["?id", ":homeworld", "?homeworld"],
            ["?id", ":age", "?age"],
            ["?id", ":alive", "?alive"],
        ],
    },
    "crux.sql.table/columns": {
        "?id": ":varchar",
        "?name": ":varchar",
        "?homeworld": ":varchar",
        "?age": ":bigint",
        "?alive": ":boolean",
    },
}


def mkstore(spark, docs, table_doc=PERSON_TABLE_DOC):
    store = TxStore(spark)
    store.submit_tx([("put", table_doc)] + [("put", d) for d in docs])
    store.commit()
    return store


IVAN = {"id": "ivan", "name": "Ivan", "homeworld": "Earth", "age": 21, "alive": True}
MALCOLM = {
    "id": "malcolm", "name": "Malcolm", "homeworld": "Mars", "age": 25, "alive": False,
}


@pytest.fixture(scope="module")
def person_store(spark):
    return mkstore(spark, [IVAN, MALCOLM])


def q(store, sql, **kw):
    return sql_tables_q(store, sql, schema=PERSON_SCHEMA, **kw)


def rows(df):
    return sorted(tuple(r) for r in df.collect())


# --- test-valid-time (calcite_test.clj:30) ---

def test_valid_time_prefix(spark):
    store = TxStore(spark)
    store.submit_tx([("put", PERSON_TABLE_DOC)])
    store.submit_tx(
        [
            ("put", {**IVAN, "name": "Ivan"}, dt.datetime(2015, 1, 1)),
            ("put", {**IVAN, "name": "Ivana"}, dt.datetime(2018, 1, 1)),
        ]
    )
    store.commit()
    tx1 = store.latest_completed_tx()
    base = "SELECT person.name FROM person WHERE homeworld = 'Earth'"

    assert rows(q(store, base)) == [("Ivana",)]
    assert rows(q(store, "VALIDTIME ('2016-12-01T10:13:30Z') " + base)) == [("Ivan",)]
    # newlines / partial RFC 3339 forms (calcite_test.clj:38-45)
    for inst in ["2016-12-01", "2016-12", "2016", "2016-12-01T10:13"]:
        assert rows(q(store, f"VALIDTIME('{inst}') \n {base}")) == [("Ivan",)]

    with pytest.raises(ValueError, match="Unrecognized date/time syntax: 2016-12-01TWOT"):
        q(store, "VALIDTIME('2016-12-01TWOT') \n " + base)

    # a correction at 2016 changes what VALIDTIME sees now ...
    store.submit_tx([("put", {**IVAN, "name": "Ivanb"}, dt.datetime(2016, 1, 1))])
    store.commit()
    assert rows(q(store, base)) == [("Ivana",)]
    assert rows(q(store, "VALIDTIME ('2016-12-01T10:13:30Z') " + base)) == [("Ivanb",)]
    # ... but TRANSACTIONID pins the pre-correction view (tx-id basis)
    assert rows(
        q(store, f"VALIDTIME ('2016-12-01T10:13:30Z') TRANSACTIONID ({tx1}) " + base)
    ) == [("Ivan",)]
    # leading comment line (calcite_test.clj:59)
    assert rows(
        q(store, f"-- comment \n VALIDTIME ('2016-12-01T10:13:30Z') TRANSACTIONID ({tx1}) " + base)
    ) == [("Ivan",)]


def test_parse_instant_forms():
    assert parse_instant("2016") == dt.datetime(2016, 1, 1)
    assert parse_instant("2016-12") == dt.datetime(2016, 12, 1)
    assert parse_instant("2016-12-01T10:13") == dt.datetime(2016, 12, 1, 10, 13)
    assert parse_instant("2016-12-01T10:13:30Z") == dt.datetime(2016, 12, 1, 10, 13, 30)
    with pytest.raises(ValueError, match="Unrecognized date/time syntax"):
        parse_instant("2016-12-01TWOT")


# --- test-project / test-project-literals-tpch-016 (calcite_test.clj:62-137) ---

def test_project(person_store):
    assert rows(q(person_store, "SELECT person.name FROM person")) == [
        ("Ivan",), ("Malcolm",)]
    assert rows(q(person_store, "SELECT person.name, person.homeworld FROM person")) == [
        ("Ivan", "Earth"), ("Malcolm", "Mars")]
    assert rows(q(person_store, "SELECT SUM(person.age) AS total_age FROM person")) == [(46,)]
    assert rows(q(person_store, "SELECT MAX(person.age) AS max_age FROM person")) == [(25,)]
    assert rows(
        q(person_store, "SELECT person.name, (2 * person.age) AS double_age FROM person")
    ) == [("Ivan", 42), ("Malcolm", 50)]


def test_project_literals_tpch_016(person_store):
    assert rows(q(person_store, "SELECT name, TRUE AS t FROM person WHERE alive = TRUE")) == [("Ivan", True)]
    assert rows(q(person_store, "SELECT name, FALSE AS t FROM person WHERE alive = TRUE")) == [("Ivan", False)]
    assert rows(q(person_store, "SELECT name, 1 AS t FROM person WHERE alive = TRUE")) == [("Ivan", 1)]
    assert rows(q(person_store, "SELECT name, 'h' AS t FROM person WHERE alive = TRUE")) == [("Ivan", "h")]
    assert rows(q(person_store, "SELECT name, 1 AS t FROM person")) == [
        ("Ivan", 1), ("Malcolm", 1)]


# --- test-sql-query (calcite_test.clj:139) ---

def test_sql_query_battery(person_store):
    s = person_store
    assert rows(q(s, "SELECT count(*) as n FROM person")) == [(2,)]
    # case insensitivity
    assert rows(q(s, "select person.name from person")) == [("Ivan",), ("Malcolm",)]
    # order by
    assert [r.name for r in q(s, "SELECT person.name FROM person ORDER BY name DESC").collect()] == ["Malcolm", "Ivan"]
    # wildcard
    assert rows(q(s, "SELECT * FROM person")) == [
        ("ivan", "Ivan", "Earth", 21, True),
        ("malcolm", "Malcolm", "Mars", 25, False)]
    # equals / <> / reversed / tautology
    assert rows(q(s, "SELECT name FROM person WHERE name = 'Ivan'")) == [("Ivan",)]
    assert rows(q(s, "SELECT name FROM person WHERE name <> 'Ivan'")) == [("Malcolm",)]
    assert rows(q(s, "SELECT name FROM person WHERE 'Ivan' = name")) == [("Ivan",)]
    assert rows(q(s, "SELECT name FROM person WHERE 'Ivan' = 'Ivan'")) == [("Ivan",), ("Malcolm",)]
    # in / and / or
    assert rows(q(s, "SELECT name FROM person WHERE name in ('Ivan')")) == [("Ivan",)]
    assert rows(q(s, "SELECT name FROM person WHERE name = 'Ivan' AND homeworld = 'Earth'")) == [("Ivan",)]
    assert rows(q(s, "SELECT name FROM person WHERE name = 'Ivan' OR age = 25")) == [("Ivan",), ("Malcolm",)]
    # numeric ranges
    assert rows(q(s, "SELECT name FROM person WHERE age > 21")) == [("Malcolm",)]
    assert rows(q(s, "SELECT name FROM person WHERE 23 > age")) == [("Ivan",)]
    assert rows(q(s, "SELECT name FROM person WHERE age >= 21")) == [("Ivan",), ("Malcolm",)]
    assert rows(q(s, "SELECT name FROM person WHERE age <= 21")) == [("Ivan",)]
    # like / substring
    assert rows(q(s, "SELECT name FROM person WHERE name LIKE 'Iva%'")) == [("Ivan",)]
    assert rows(q(s, "SELECT name FROM person WHERE name LIKE 'Iva%' OR name LIKE 'Mal%'")) == [("Ivan",), ("Malcolm",)]
    assert rows(q(s, "SELECT SUBSTRING(name, 1, 3) AS name FROM person WHERE name = 'Ivan'")) == [("Iva",)]
    # unknown column
    with pytest.raises(Exception, match="(?i)nocnolumn"):
        q(s, "SELECT nocnolumn FROM person").collect()


# --- test-booleans / test-equality-of-columns / test-arithmetic ---

def test_booleans(person_store):
    s = person_store
    assert rows(q(s, "SELECT name FROM person WHERE alive = TRUE")) == [("Ivan",)]
    assert rows(q(s, "SELECT name FROM person WHERE alive = FALSE")) == [("Malcolm",)]
    assert rows(q(s, "SELECT name FROM person WHERE name IS NOT NULL AND alive = TRUE")) == [("Ivan",)]


def test_equality_of_columns(spark):
    s = mkstore(spark, [{**IVAN, "homeworld": "Ivan"}, MALCOLM])
    assert rows(q(s, "SELECT person.name FROM person WHERE name = homeworld")) == [("Ivan",)]


def test_arithmetic(spark):
    s = mkstore(spark, [{**IVAN, "age": 21}])
    assert rows(q(s, "SELECT CAST(age / 2 AS BIGINT) AS age FROM person")) == [(10,)]
    assert rows(q(s, "SELECT (age * 2) AS age FROM person")) == [(42,)]
    assert rows(q(s, "SELECT (age + 2) AS age FROM person")) == [(23,)]
    assert rows(q(s, "SELECT (age - 2) AS age FROM person")) == [(19,)]
    assert rows(q(s, "SELECT mod(age, 6) AS age FROM person")) == [(3,)]
    assert rows(q(s, "SELECT mod(age + 2, 6) AS age FROM person")) == [(5,)]


# --- test-calcs (calcite_test.clj:268) ---

def test_calcs(spark):
    table = {
        "id": "crux.sql.schema/person",
        "crux.sql.table/name": "person",
        "crux.sql.table/query": {
            "find": ["?id", "?name", "?age", "?years_worked"],
            "where": [
                ["?id", ":name", "?name"],
                ["?id", ":age", "?age"],
                ["?id", ":years_worked", "?years_worked"],
            ],
        },
        "crux.sql.table/columns": {
            "?id": ":varchar", "?name": ":varchar",
            "?age": ":bigint", "?years_worked": ":bigint",
        },
    }
    store = mkstore(
        spark,
        [{"id": "ivan", "name": "Ivan", "age": 42, "years_worked": 21},
         {"id": "malcolm", "name": "Malcolm", "age": 22, "years_worked": 10}],
        table,
    )
    schema = "id string, name string, age long, years_worked long"
    qq = lambda sql: sql_tables_q(store, sql, schema=schema)
    assert [r.name for r in qq("SELECT person.name FROM person WHERE age = (years_worked * 2)").collect()] == ["Ivan"]
    assert [r.name for r in qq("SELECT person.name FROM person WHERE age = (2 + (years_worked * 2))").collect()] == ["Malcolm"]
    assert rows(qq("SELECT name, (person.age * 2) AS age FROM person")) == [
        ("Ivan", 84), ("Malcolm", 44)]
    assert rows(qq("SELECT name, ((person.age * 2) * 3) AS age FROM person")) == [
        ("Ivan", 252), ("Malcolm", 132)]
    assert rows(qq("SELECT name FROM person WHERE name = 'Malcolm' OR age = (2 * years_worked)")) == [
        ("Ivan",), ("Malcolm",)]
    assert rows(qq("SELECT name FROM person WHERE substring(name, 1, 1) in ('I', 'V')")) == [("Ivan",)]


# --- test-query-for-null (calcite_test.clj:361) via nullable-columns ---

def test_query_for_null(spark):
    table = dict(PERSON_TABLE_DOC)
    table["crux.sql.table/nullable-columns"] = ["?homeworld"]
    store = mkstore(
        spark,
        [{"id": "ivan", "name": "Ivan", "age": 21, "alive": True},  # no homeworld
         MALCOLM],
        table,
    )
    assert rows(q(store, "SELECT person.name FROM person WHERE homeworld IS NULL")) == [("Ivan",)]
    assert rows(q(store, "SELECT person.name FROM person WHERE homeworld IS NOT NULL")) == [("Malcolm",)]
    assert len(q(store, "SELECT person.name FROM person WHERE 'FOO' IS NOT NULL").collect()) == 2


# --- test-cardinality (calcite_test.clj:370) ---

def test_cardinality_repeated_attr_cross_product(spark):
    """Two clauses binding the SAME cardinality-many attribute to
    different vars ([?e :a ?x] [?e :a ?y]) must yield the full element
    cross-product (incl. ?x != ?y pairs), matching the Datalog path —
    the fast path explodes each clause independently."""
    table = {
        **PERSON_TABLE_DOC,
        "crux.sql.table/query": {
            "find": ["?id", "?hw1", "?hw2"],
            "where": [
                ["?id", ":homeworld", "?hw1"],
                ["?id", ":homeworld", "?hw2"],
            ],
        },
        "crux.sql.table/columns": {
            "?id": ":varchar", "?hw1": ":varchar", "?hw2": ":varchar",
        },
    }
    schema = "id string, homeworld array<string>"
    store = mkstore(
        spark,
        [{"id": "malcolm", "homeworld": ["Mars", "Earth"]}],
        table,
    )
    got = sorted(
        (r.hw1, r.hw2)
        for r in sql_tables_q(
            store, "SELECT hw1, hw2 FROM person", schema=schema
        ).collect()
    )
    assert got == [
        ("Earth", "Earth"), ("Earth", "Mars"),
        ("Mars", "Earth"), ("Mars", "Mars"),
    ]


def test_cardinality(spark):
    table = dict(PERSON_TABLE_DOC)
    schema = "id string, name string, homeworld array<string>, age long, alive boolean"
    store = mkstore(
        spark,
        [{**IVAN, "homeworld": ["Earth"]},
         {**MALCOLM, "homeworld": ["Mars", "Earth"]}],
        table,
    )
    qq = lambda sql: sql_tables_q(store, sql, schema=schema)
    assert sorted(r.name for r in qq("SELECT * FROM person WHERE homeworld = 'Earth'").collect()) == ["Ivan", "Malcolm"]
    assert sorted(r.name for r in qq("SELECT * FROM person").collect()) == ["Ivan", "Malcolm", "Malcolm"]


# --- test-limit-and-offset (calcite_test.clj:395) ---

def test_limit_and_offset(spark):
    store = mkstore(
        spark,
        [{"id": f"ivan{i}", "name": "Ivan", "homeworld": "Earth", "age": 21,
          "alive": True} for i in range(20)],
    )
    assert len(q(store, "SELECT * FROM person WHERE name='Ivan'").collect()) == 20
    assert len(q(store, "SELECT * FROM person WHERE name='Ivan' LIMIT 10").collect()) == 10
    assert len(q(store, "SELECT * FROM person WHERE name='Ivan' ORDER BY id LIMIT 10 OFFSET 15").collect()) == 5


# --- test-prepare-statement (calcite_test.clj:422) ---

def test_prepared_statement(spark):
    store = mkstore(spark, [IVAN, {**MALCOLM, "name": " Malcolm"}])
    assert rows(q(store, "SELECT homeworld FROM person WHERE name = ?", args=["Ivan"])) == [("Earth",)]
    assert rows(q(store, "SELECT homeworld FROM person WHERE TRIM(name) = ?", args=["Ivan"])) == [("Earth",)]
    assert rows(q(store, "SELECT name FROM person WHERE age > ?", args=[23])) == [(" Malcolm",)]


# --- test-sort (calcite_test.clj:429) ---

def test_sort(spark):
    store = mkstore(
        spark,
        [IVAN, MALCOLM,
         {"id": "fred", "name": "Fred", "homeworld": "Mars", "age": 90, "alive": False}],
    )
    names = lambda sql: [r.name for r in q(store, sql).collect()]
    assert names("SELECT name FROM person ORDER BY name") == ["Fred", "Ivan", "Malcolm"]
    assert names("SELECT name FROM person ORDER BY name DESC") == ["Malcolm", "Ivan", "Fred"]
    assert names("SELECT name FROM person ORDER BY homeworld DESC, age") == ["Malcolm", "Fred", "Ivan"]
    assert names("SELECT name FROM person ORDER BY homeworld DESC, age DESC") == ["Fred", "Malcolm", "Ivan"]


# --- test-different-data-types (calcite_test.clj:451) ---

def test_different_data_types(spark):
    table = {
        "id": "crux.sql.schema/person",
        "crux.sql.table/name": "person",
        "crux.sql.table/query": {
            "find": ["?id", "?name", "?born", "?afloat", "?adecimal"],
            "where": [
                ["?id", ":name", "?name"],
                ["?id", ":born", "?born"],
                ["?id", ":afloat", "?afloat"],
                ["?id", ":adecimal", "?adecimal"],
            ],
        },
        "crux.sql.table/columns": {
            "?id": ":keyword", "?name": ":varchar", "?born": ":timestamp",
            "?afloat": ":float", "?adecimal": ":decimal",
        },
    }
    store = mkstore(
        spark,
        [{"id": "human/ivan", "name": "Ivan", "born": "2010-07-01T00:00:00",
          "afloat": 1.0, "adecimal": 1.3}],
        table,
    )
    schema = "id string, name string, born timestamp, afloat float, adecimal double"
    out = sql_tables_q(store, "SELECT * FROM person", schema=schema).collect()
    assert out[0].id == "human/ivan"
    assert out[0].born == dt.datetime(2010, 7, 1)
    assert float(out[0].afloat) == 1.0
    assert sql_tables_q(
        store, "SELECT name FROM person WHERE adecimal = 1.3", schema=schema
    ).collect()[0].name == "Ivan"


def test_restricted_types_raise(spark):
    table = {
        "id": "crux.sql.schema/person",
        "crux.sql.table/name": "person",
        "crux.sql.table/query": {"find": ["?id", "?born"],
                                 "where": [["?id", ":born", "?born"]]},
        "crux.sql.table/columns": {"?id": ":keyword", "?born": ":time"},
    }
    store = mkstore(spark, [], table)
    with pytest.raises(ValueError, match="Unrecognised java.sql.Types: :time"):
        register_sql_tables(store, schema="id string, born string")


def test_missing_column_definition_raises(spark):
    table = {
        "id": "crux.sql.schema/person",
        "crux.sql.table/name": "person",
        "crux.sql.table/query": {"find": ["?id", "?name"],
                                 "where": [["?id", ":name", "?name"]]},
        "crux.sql.table/columns": {"?id": ":keyword"},
    }
    store = mkstore(spark, [], table)
    with pytest.raises(ValueError, match=r"Unrecognised column: \?name"):
        register_sql_tables(store, schema="id string, name string")


# --- test-simple-joins / test-table-backed-by-query (calcite_test.clj:487-614) ---

JOIN_SCHEMA = (
    "id string, name string, planet string, age long, climate string, "
    "captain string, decks long"
)


def _join_tables():
    def tdoc(tname, cols):
        return {
            "id": f"crux.sql.schema/{tname}",
            "crux.sql.table/name": tname,
            "crux.sql.table/query": {
                "find": [f"?{c}" for c in cols],
                "where": [[f"?{cols[0]}", f":{c}", f"?{c}"] for c in cols[1:]],
            },
            "crux.sql.table/columns": {
                f"?{c}": (":bigint" if c in ("age", "decks") else ":varchar")
                for c in cols
            },
        }
    return [
        tdoc("person", ["id", "name", "planet", "age"]),
        tdoc("planet", ["id", "name", "climate", "age"]),
        tdoc("ship", ["id", "name", "captain", "decks"]),
    ]


@pytest.fixture(scope="module")
def joins_store(spark):
    store = TxStore(spark)
    store.submit_tx(
        [("put", t) for t in _join_tables()]
        + [
            ("put", {"id": "person/ivan", "name": "Ivan", "planet": "earth", "age": 25}),
            ("put", {"id": "person/malcolm", "name": "Malcolm", "planet": "mars", "age": 21}),
            ("put", {"id": "planet/earth", "name": "earth", "climate": "Hot", "age": 42}),
            ("put", {"id": "ship/enterprise", "name": "enterprise", "captain": "Ivan", "decks": 13}),
        ]
    )
    store.commit()
    return store


def test_simple_joins(joins_store):
    qq = lambda sql: sql_tables_q(joins_store, sql, schema=JOIN_SCHEMA)
    got = qq("SELECT * FROM person INNER JOIN planet ON person.planet = planet.name").collect()
    assert len(got) == 1 and got[0]["climate"] == "Hot"

    got = qq(
        "SELECT person.id, person.name AS person, planet.name AS planet "
        "FROM person INNER JOIN planet ON person.planet = planet.name"
    ).collect()
    assert [tuple(r) for r in got] == [("person/ivan", "Ivan", "earth")]

    got = qq(
        "SELECT * FROM person "
        "INNER JOIN planet ON person.planet = planet.name "
        "INNER JOIN ship ON ship.captain = person.name"
    ).collect()
    assert len(got) == 1 and got[0]["decks"] == 13

    # join using calc
    got = qq(
        "SELECT person.name FROM person INNER JOIN planet ON planet.age = (2 * person.age)"
    ).collect()
    assert [r.name for r in got] == ["Malcolm"]

    # left outer join
    got = qq(
        "SELECT person.name FROM person LEFT OUTER JOIN planet ON person.planet = planet.name"
    ).collect()
    assert sorted(r.name for r in got) == ["Ivan", "Malcolm"]


def test_table_backed_by_query(spark):
    table = {
        "id": "crux.sql.schema/person",
        "crux.sql.table/name": "person",
        "crux.sql.table/query": {
            "find": ["?id", "?name", "?planet"],
            "where": [
                ["?id", ":name", "?name"],
                ["?id", ":planet", "?planet"],
                ["?id", ":planet", "earth"],
            ],
        },
        "crux.sql.table/columns": {
            "?id": ":keyword", "?name": ":varchar", "?planet": ":varchar",
        },
    }
    store = mkstore(
        spark,
        [{"id": "person/ivan", "name": "Ivan", "planet": "earth"},
         {"id": "person/igor", "name": "Igor", "planet": "not-earth"}],
        table,
    )
    got = sql_tables_q(
        store, "SELECT * FROM person", schema="id string, name string, planet string"
    ).collect()
    assert [tuple(r) for r in got] == [("person/ivan", "Ivan", "earth")]


# --- test-calcite-built-in-fns (calcite_test.clj:626) — Spark SQL surface ---

def test_built_in_fns(spark):
    store = mkstore(
        spark,
        [{"id": "human/ivan", "name": " Ivan ", "homeworld": "earth",
          "age": 21, "alive": True}],
    )
    one = lambda sql: q(store, sql).collect()[0][0]
    assert one("SELECT LOWER(name) FROM person") == " ivan "
    assert one("SELECT UPPER(name) FROM person") == " IVAN "
    assert one("SELECT INITCAP(homeworld) FROM person") == "Earth"
    assert one("SELECT LOWER(' IVAN ') FROM person") == " ivan "
    assert one("SELECT INITCAP(LOWER(homeworld)) FROM person") == "Earth"
    assert one("SELECT TRIM(name) FROM person") == "Ivan"
    assert one("SELECT CONCAT(name, 'qs') FROM person") == " Ivan qs"
    assert one("SELECT TRIM(CONCAT(name, 'qs')) FROM person") == "Ivan qs"
    assert one("SELECT CEIL(age) FROM person") == 21
    assert one("SELECT CEIL(1.1) FROM person") == 2
    assert one("SELECT FLOOR(1.1) FROM person") == 1
    # Calcite TRUNCATE(x, d) -> Spark floor(x, d) for positive values
    assert float(one("SELECT FLOOR(1.12, 1) FROM person")) == 1.1
    assert one("SELECT REPLACE(name, 'v', 'A') FROM person") == " IAan "
    assert one("SELECT CHAR_LENGTH(name) FROM person") == 6
    assert one("SELECT current_date FROM person") is not None
    assert one("SELECT current_timestamp FROM person") is not None
    assert one("SELECT last_day(current_timestamp) FROM person") is not None


def test_registry_side_set_prunes_discovery(spark):
    """r10 (verdict): register_sql_tables must read the registry through
    the write-time schema-doc side-set (pushed eid IN-filter), never a
    full doc_json contains() scan per registration."""
    from pyspark.sql import functions as F

    from crux_spark.sql import _registry_docs_df

    store = mkstore(spark, [IVAN, MALCOLM])
    # incremental tracking: the put stream already seeded the set —
    # no discovery scan pending
    assert store._schema_eids == {"crux.sql.schema/person"}
    assert store.schema_doc_eids() == ["crux.sql.schema/person"]
    # the registry read plans an eid IN-filter over the snapshot: the
    # registry eid appears in the plan, and with the side-set empty the
    # read short-circuits to None (zero Spark jobs)
    plan = _registry_docs_df(store)._jdf.queryExecution().toString()
    assert "crux.sql.schema/person" in plan
    empty = TxStore(spark)
    empty.submit_tx([("put", IVAN)])
    empty.commit()
    assert _registry_docs_df(empty) is None
    assert register_sql_tables(empty) == []

    # delete/evict of the registry doc: the eid stays in the side-set
    # (superset), but the snapshot read finds no live doc -> no tables
    store.submit_tx([("evict", "crux.sql.schema/person")])
    store.commit()
    assert register_sql_tables(store) == []

    # bulk/apply writes bypass the driver: the set invalidates, then ONE
    # discovery scan re-seeds it (including registry docs that arrived
    # distributed) and registration works
    store2 = mkstore(spark, [IVAN, MALCOLM])
    import json as _json

    from crux_spark.bitemporal.store import OPS_SCHEMA

    other_doc = {**PERSON_TABLE_DOC, "id": "crux.sql.schema/person2",
                 "crux.sql.table/name": "person2"}
    ops = spark.createDataFrame(
        [("crux.sql.schema/person2", store2._tx_id + 1, 0, "put",
          1_000_000, _json.dumps(other_doc, sort_keys=True), None,
          None, None, None, None)],
        OPS_SCHEMA,
    )
    store2.apply_ops_df(ops)
    store2._tx_id += 1
    assert store2._schema_eids is None  # invalidated
    assert store2.schema_doc_eids() == [
        "crux.sql.schema/person", "crux.sql.schema/person2",
    ]
    assert store2._schema_eids is not None  # re-seeded, incremental again
    names = register_sql_tables(store2)
    assert sorted(names) == ["person", "person2"]

    # forks inherit a copy
    fork = store2.with_tx([("put", IVAN)])
    assert fork._schema_eids == store2._schema_eids


def test_registry_side_set_survives_save_load(spark, tmp_path):
    """r10: save() persists the side-set as a sidecar, so a load()ed
    store registers tables with zero discovery scans."""
    store = mkstore(spark, [IVAN, MALCOLM])
    d = str(tmp_path / "ckpt")
    store.save(d)
    loaded = TxStore.load(spark, d)
    assert loaded._schema_eids == {"crux.sql.schema/person"}
    assert register_sql_tables(loaded) == ["person"]


@pytest.mark.parametrize("bad", ['"abc"', "7", '["ok", 3]', "{}"])
def test_registry_sidecar_shape_validated(spark, tmp_path, bad):
    """r10 advice: a sidecar that parses as JSON but is not a list of
    strings (a string would become a set of CHARACTERS and silently hide
    registry docs; a number would TypeError) must be rejected like a
    corrupt sidecar — fall back to the discovery scan, tables intact."""
    import os

    store = mkstore(spark, [IVAN, MALCOLM])
    d = str(tmp_path / "ckpt")
    store.save(d)
    with open(os.path.join(d, "_schema_doc_eids.json"), "w") as f:
        f.write(bad)
    loaded = TxStore.load(spark, d)
    assert loaded._schema_eids is None  # discovery scan on first use
    assert register_sql_tables(loaded) == ["person"]
