"""Pull spec parameters + recursion corpus, ported from the reference's
crux-core/test/crux/datascript_pull_test.clj (itself adapted from the
DataScript pull_api tests): :as / :default / :limit params, reverse-join
:as, unlimited ``...`` recursion, and the seen-set cycle guard rendering
revisited entities as id-only stubs."""

import pytest
from pyspark.sql import types as T

from crux_spark import Catalog
from crux_spark.datalog.pull import pull


def _people(spark, kerri_friends=None):
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("aka", T.ArrayType(T.StringType())),
            T.StructField("parent", T.ArrayType(T.StringType())),
            T.StructField("friend", T.ArrayType(T.StringType())),
        ]
    )
    data = [
        ("petr", "Petr", ["Devil", "Tupen"], None, None),
        ("david", "David", None, ["petr"], None),
        ("thomas", "Thomas", None, ["petr"], None),
        ("lucy", "Lucy", None, None, ["elizabeth"]),
        ("elizabeth", "Elizabeth", None, None, ["matthew"]),
        ("matthew", "Matthew", None, ["thomas"], ["eunan"]),
        ("eunan", "Eunan", None, None, ["kerri"]),
        ("kerri", "Kerri", None, None, kerri_friends),
        ("rebecca", "Rebecca", None, None, None),
    ]
    cat = Catalog(spark)
    cat.add_documents("people", spark.createDataFrame(data, schema), id_col="id")
    return cat


@pytest.fixture(scope="module")
def pcat(spark):
    return _people(spark)


@pytest.fixture(scope="module")
def cyclic_cat(spark):
    # kerri -> lucy closes the friend chain into a cycle
    # (datascript_pull_test.clj:214-218)
    return _people(spark, kerri_friends=["lucy"])


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0].pull


def test_as_renames_fields(pcat, spark):
    # (:name {:as "Name"}) (:aka {:as :alias}) — datascript_pull_test.clj:129-135
    base = spark.createDataFrame([("petr",)], ["e"])
    d = _one(
        pull(pcat, base, "e", "people", [[":name", {"as": "Name"}], [":aka", {"as": ":alias"}]])
    ).asDict()
    assert d["Name"] == "Petr" and sorted(d["alias"]) == ["Devil", "Tupen"]


def test_default_replaces_nil(pcat, spark):
    # (:foo {:default "bar"}) — datascript_pull_test.clj:116-127. The typed
    # catalog has no :foo column, so default over a nil-valued typed attr:
    base = spark.createDataFrame([("rebecca",)], ["e"])
    d = _one(
        pull(pcat, base, "e", "people", [[":aka", {"default": ["none"]}]])
    ).asDict()
    assert d["aka"] == ["none"]


def test_as_with_default(pcat, spark):
    # (:x {:as "Name", :default "Nothing"}) — datascript_pull_test.clj:137-140
    base = spark.createDataFrame([("rebecca",)], ["e"])
    d = _one(
        pull(
            pcat, base, "e", "people",
            [[":name", {"as": "N"}], [":aka", {"as": "A", "default": ["Nothing"]}]],
        )
    ).asDict()
    assert d["N"] == "Rebecca" and d["A"] == ["Nothing"]


def test_limit_truncates_multivalued(pcat, spark):
    # (:aka {:limit 1}) — datascript_pull_test.clj:97-106
    base = spark.createDataFrame([("petr",)], ["e"])
    d = _one(pull(pcat, base, "e", "people", [[":aka", {"limit": 1}]])).asDict()
    assert len(d["aka"]) == 1


def test_join_limit(pcat, spark):
    # {(:friend {:limit 2}) [:name]} — datascript_pull_test.clj:111-114
    # petr has two children via reverse :_parent; limit to 1
    base = spark.createDataFrame([("petr",)], ["e"])
    d = _one(
        pull(
            pcat, base, "e", "people",
            [":name", {":_parent": {"spec": [":name"], "limit": 1}}],
            joins={":parent": "people"},
        )
    )
    assert len(d["_parent"]) == 1


def test_reverse_join_as(pcat, spark):
    # {(:_parent {:as :children}) [:name]} — datascript_pull_test.clj:150-154
    base = spark.createDataFrame([("petr",)], ["e"])
    d = _one(
        pull(
            pcat, base, "e", "people",
            [":name", {":_parent": {"spec": [":name"], "as": ":children"}}],
            joins={":parent": "people"},
        )
    )
    names = sorted(s["name"] for s in d["children"])
    assert d["name"] == "Petr" and names == ["David", "Thomas"]


def test_unlimited_recursion_chain(pcat, spark):
    # {:friend ...} on the acyclic chain — datascript_pull_test.clj:179-202:
    # Lucy -> Elizabeth -> Matthew -> Eunan -> Kerri
    base = spark.createDataFrame([("lucy",)], ["e"])
    d = _one(
        pull(
            pcat, base, "e", "people",
            [":name", {":friend": "..."}],
            joins={":friend": "people"},
        )
    )
    chain = []
    node = d
    while node is not None:
        chain.append(node["name"])
        kids = node["friend"]
        node = kids[0] if kids else None
    assert chain == ["Lucy", "Elizabeth", "Matthew", "Eunan", "Kerri"]


def test_unlimited_recursion_cycle_guard(cyclic_cat, spark):
    # with kerri -> lucy the chain cycles; the revisited entity renders as
    # an id-only stub ({:crux.db/id :lucy}) — datascript_pull_test.clj:214-218
    base = spark.createDataFrame([("lucy",)], ["e"])
    d = _one(
        pull(
            cyclic_cat, base, "e", "people",
            [":name", {":friend": "..."}],
            joins={":friend": "people"},
        )
    )
    node = d
    names = []
    while True:
        stub = "name" not in node.__fields__ or node["name"] is None
        if stub:  # the id-only stub, the reference's {:crux.db/id :lucy}
            assert node["id"] == "lucy"
            break
        names.append(node["name"])
        kids = node["friend"]
        assert kids is not None and len(kids) == 1
        node = kids[0]
    assert names == ["Lucy", "Elizabeth", "Matthew", "Eunan", "Kerri"]


def test_bounded_recursion_cycle_guard(cyclic_cat, spark):
    # bounded recursion stops at the cap even on the cyclic graph
    base = spark.createDataFrame([("lucy",)], ["e"])
    d = _one(
        pull(
            cyclic_cat, base, "e", "people",
            [":name", {":friend": 2}],
            joins={":friend": "people"},
        )
    )
    lvl1 = d["friend"][0]
    lvl2 = lvl1["friend"][0]
    assert (d["name"], lvl1["name"], lvl2["name"]) == ("Lucy", "Elizabeth", "Matthew")
    assert lvl2["friend"] is None  # cut at the cap


def test_recursion_from_multiple_roots(pcat, spark):
    base = spark.createDataFrame([("lucy",), ("eunan",), ("kerri",)], ["e"])
    out = pull(
        pcat, base, "e", "people",
        [":name", {":friend": "..."}],
        joins={":friend": "people"},
    ).collect()
    by_id = {r.e: r.pull for r in out}
    assert by_id["kerri"]["friend"] is None
    assert by_id["eunan"]["friend"][0]["name"] == "Kerri"
    assert by_id["lucy"]["friend"][0]["name"] == "Elizabeth"


def test_pull_union_spec(spark):
    """pull_test.clj:170-186 test-union: the value of the dispatch attr
    picks which branch's attributes project (others stay null)."""
    from crux_spark import Catalog
    from pyspark.sql import types as T

    from crux_spark.datalog.pull import pull

    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("x", T.LongType()),
            T.StructField("y", T.StringType()),
            T.StructField("z", T.LongType()),
        ]
    )
    c = Catalog(spark)
    c.add_documents(
        "things",
        spark.createDataFrame(
            [("foo", "a", 2, "this", 99), ("bar", "b", None, "not this", 5)],
            schema,
        ),
        id_col="id",
    )
    base = spark.createDataFrame([("foo",), ("bar",)], ["e"])
    rows = {
        r.e: r.pull.asDict()
        for r in pull(
            c, base, "e", "things", [":id", {":type": {"a": [":x", ":y"], "b": [":z"]}}]
        ).collect()
    }
    assert rows["foo"] == {"id": "foo", "x": 2, "y": "this", "z": None}
    assert rows["bar"] == {"id": "bar", "x": None, "y": None, "z": 5}


def test_pull_many_and_unknown_eid(spark):
    """pull_test.clj:117-133 pullMany + :242 doesnt-hang-on-unknown-eid:
    batch pull preserves request order, unknown ids give None."""
    from crux_spark.node import Node

    node = Node(spark, schema="name string, year string")
    node.submit_tx(
        [
            ("put", {"id": "skyfall", "name": "Skyfall", "year": "2012"}),
            ("put", {"id": "spectre", "name": "Spectre", "year": "2015"}),
        ]
    )
    node.await_tx()
    got = node.db().pull_many(
        ["spectre", "nope", "skyfall"], [":name", ":year"]
    )
    assert got[0] == {"name": "Spectre", "year": "2015"}
    assert got[1] is None
    assert got[2] == {"name": "Skyfall", "year": "2012"}
    assert node.db().pull("unknown-eid", [":name"]) is None
