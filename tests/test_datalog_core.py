"""Core Datalog compiler semantics, checked against direct DataFrame results.

Models the reference's e2e corpus (crux-test/test/crux/query_test.clj):
triple patterns, joins, range preds, not/or, in-bindings, aggregates,
order/limit, set-result semantics.
"""

from pyspark.sql import functions as F

from crux_spark.datalog import q


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_scan_filter_range(catalog):
    res = q(
        catalog,
        {
            "find": ["?name", "?bal"],
            "where": [
                ["?c", ":c_name", "?name"],
                ["?c", ":c_acctbal", "?bal"],
                [[">", "?bal", 9000.0]],
            ],
        },
    )
    exp = (
        catalog.table("customer")
        .filter(F.col("c_acctbal") > 9000.0)
        .select("c_name", "c_acctbal")
        .distinct()
    )
    assert rows(res) == rows(exp)
    assert res.columns == ["name", "bal"]


def test_literal_value_binding(catalog):
    res = q(
        catalog,
        {
            "find": ["?name"],
            "where": [
                ["?n", ":n_name", "?name"],
                ["?n", ":n_regionkey", "?rk"],
                ["?r", ":r_regionkey", "?rk"],
                ["?r", ":r_name", "ASIA"],
            ],
        },
    )
    exp = (
        catalog.table("nation")
        .join(catalog.table("region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("n_name")
        .distinct()
    )
    assert rows(res) == rows(exp)


def test_same_entity_multiple_attrs_single_scan(catalog):
    # two attrs of one entity must NOT self-join: plan should contain exactly
    # one scan of customer
    df = q(
        catalog,
        {
            "find": ["?name"],
            "where": [
                ["?c", ":c_name", "?name"],
                ["?c", ":c_mktsegment", "BUILDING"],
            ],
        },
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("relation") <= 1 or plan.count("customer") <= 1
    exp = (
        catalog.table("customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_name")
        .distinct()
    )
    assert rows(df) == rows(exp)


def test_join_across_entities(catalog):
    res = q(
        catalog,
        {
            "find": ["?cname", "?nname"],
            "where": [
                ["?c", ":c_name", "?cname"],
                ["?c", ":c_nationkey", "?nk"],
                ["?n", ":n_nationkey", "?nk"],
                ["?n", ":n_name", "?nname"],
            ],
        },
    )
    exp = (
        catalog.table("customer")
        .join(catalog.table("nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_name", "n_name")
        .distinct()
    )
    assert rows(res) == rows(exp)


def test_in_scalar_and_collection(catalog):
    res = q(
        catalog,
        {
            "find": ["?name"],
            "in": ["?seg", ["?nk", "..."]],
            "where": [
                ["?c", ":c_name", "?name"],
                ["?c", ":c_mktsegment", "?seg"],
                ["?c", ":c_nationkey", "?nk"],
            ],
        },
        "BUILDING",
        [1, 2, 3],
    )
    exp = (
        catalog.table("customer")
        .filter((F.col("c_mktsegment") == "BUILDING") & F.col("c_nationkey").isin(1, 2, 3))
        .select("c_name")
        .distinct()
    )
    assert rows(res) == rows(exp)


def test_not_clause(catalog):
    res = q(
        catalog,
        {
            "find": ["?name"],
            "where": [
                ["?n", ":n_name", "?name"],
                ["not", ["?n", ":n_regionkey", 0]],
            ],
        },
    )
    exp = (
        catalog.table("nation")
        .filter(F.col("n_regionkey") != 0)
        .select("n_name")
        .distinct()
    )
    assert rows(res) == rows(exp)


def test_or_clause(catalog):
    res = q(
        catalog,
        {
            "find": ["?name"],
            "where": [
                ["?n", ":n_name", "?name"],
                ["?n", ":n_regionkey", "?rk"],
                ["or", [["=", "?rk", 0]], [["=", "?rk", 2]]],
            ],
        },
    )
    exp = (
        catalog.table("nation")
        .filter(F.col("n_regionkey").isin(0, 2))
        .select("n_name")
        .distinct()
    )
    assert rows(res) == rows(exp)


def test_aggregates(catalog):
    res = q(
        catalog,
        {
            "find": [
                "?flag",
                ["sum", "?qty", "sum_qty"],
                ["avg", "?qty", "avg_qty"],
                ["count", "?qty", "n"],
            ],
            "where": [
                ["?l", ":l_returnflag", "?flag"],
                ["?l", ":l_quantity", "?qty"],
            ],
        },
    )
    exp = (
        catalog.table("lineitem")
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count("l_quantity").alias("n"),
        )
    )
    got, want = rows(res), rows(exp)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and abs(g[1] - w[1]) < 1e-6 and abs(g[2] - w[2]) < 1e-9


def test_order_limit_offset(catalog):
    res = q(
        catalog,
        {
            "find": ["?name", "?bal"],
            "where": [
                ["?c", ":c_name", "?name"],
                ["?c", ":c_acctbal", "?bal"],
            ],
            "order-by": [["?bal", "desc"], ["?name", "asc"]],
            "limit": 5,
            "offset": 2,
        },
    )
    exp = (
        catalog.table("customer")
        .select(F.col("c_name").alias("name"), F.col("c_acctbal").alias("bal"))
        .orderBy(F.col("bal").desc(), F.col("name").asc())
        .offset(2)
        .limit(5)
    )
    assert [tuple(r) for r in res.collect()] == [tuple(r) for r in exp.collect()]


def test_pred_binding_and_expression(catalog):
    res = q(
        catalog,
        {
            "find": ["?ok", ["sum", "?rev", "revenue"]],
            "where": [
                ["?l", ":l_orderkey", "?ok"],
                ["?l", ":l_extendedprice", "?p"],
                ["?l", ":l_discount", "?d"],
                [["*", "?p", ["-", 1, "?d"]], "?rev"],
            ],
            "limit": 10,
            "order-by": [["?ok", "asc"]],
        },
    )
    assert res.columns == ["ok", "revenue"]
    assert res.count() == 10


def test_keys_renaming(catalog):
    res = q(
        catalog,
        {
            "find": ["?name"],
            "keys": ["nation_name"],
            "where": [["?n", ":n_name", "?name"]],
        },
    )
    assert res.columns == ["nation_name"]
    assert res.count() == 25


def test_find_var_unbound_error(catalog):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not bound by any where clause"):
        q(catalog, {"find": ["?zzz"], "where": [["?n", ":n_name", "?x"]]})


def test_datascript_not_join_multi_var(catalog):
    # not-join with explicit unification vars (datascript not corpus)
    res = q(
        catalog,
        {
            "find": ["?name"],
            "where": [
                ["?c", ":c_name", "?name"],
                ["?c", ":c_nationkey", "?nk"],
                ["not-join", ["?nk"], ["?s", ":s_nationkey", "?nk"]],
            ],
        },
    )
    from pyspark.sql import functions as _F

    sup_nk = {r[0] for r in catalog.table("supplier").select("s_nationkey").collect()}
    exp = (
        catalog.table("customer")
        .filter(~_F.col("c_nationkey").isin(*sup_nk))
        .select("c_name")
        .distinct()
        .count()
    )
    assert res.count() == exp


def test_datascript_nested_not_inside_or_branch(catalog):
    # or-join branch containing a not (nested negation)
    res = q(
        catalog,
        {
            "find": ["?name"],
            "where": [
                ["?n", ":n_name", "?name"],
                ["?n", ":n_regionkey", "?rk"],
                [
                    "or-join",
                    ["?rk"],
                    [["=", "?rk", 0]],
                    ["and", ["?r", ":r_regionkey", "?rk"], ["not", ["?r", ":r_name", "ASIA"]], [[">", "?rk", 2]]],
                ],
            ],
        },
    )
    # rk==0, or rk>2 and region not ASIA (ASIA is rk 2) -> rk in {0, 3, 4}
    got = sorted(r.name for r in res.collect())
    from pyspark.sql import functions as _F

    exp = sorted(
        r.n_name
        for r in catalog.table("nation").filter(_F.col("n_regionkey").isin(0, 3, 4)).collect()
    )
    assert got == exp


def test_aggregate_empty_input(catalog):
    # aggregation over an empty match set: global agg -> one row with
    # null/0 per Spark semantics; grouped agg -> zero rows
    res = q(
        catalog,
        {
            "find": ["?flag", ["sum", "?qty", "s"]],
            "where": [
                ["?l", ":l_returnflag", "?flag"],
                ["?l", ":l_quantity", "?qty"],
                [[">", "?qty", 1e9]],
            ],
        },
    )
    assert res.count() == 0


def test_var_attribute_position(spark):
    from crux_spark import Catalog
    from pyspark.sql import types as T

    cat = Catalog(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("age", T.LongType()),
        ]
    )
    cat.add_documents(
        "ppl", spark.createDataFrame([("a", "Ann", 30), ("b", "Bob", None)], schema), id_col="id"
    )
    # which attributes does entity a have?
    res = q(
        cat,
        {"find": ["?a"], "in": ["?e"], "where": [["?e", "?a", "_"]]},
        "a",
    )
    assert sorted(r.a for r in res.collect()) == [":age", ":id", ":name"]
    # entities having ANY attribute with value "Ann"
    res2 = q(cat, {"find": ["?e", "?a"], "where": [["?e", "?a", "Ann"]]})
    assert [(r.e, r.a) for r in res2.collect()] == [("a", ":name")]


def test_eav_typed_value_predicates(catalog):
    """Numeric predicates over a var-attribute pattern must compare typed
    values, not stringified ones ("950.5" > "9000.0" lexically but not
    numerically — codec.clj:81-99's typed order)."""
    from pyspark.sql import functions as F

    from crux_spark.datalog import q

    df = q(
        catalog,
        {
            "find": ["?e", "?v"],
            "keys": ["e", "v"],
            "where": [
                ["?e", "?a", "?v"],
                [["=", "?a", ":c_acctbal"]],
                [[">", "?v", 9000.0]],
            ],
        },
    )
    rows = df.collect()
    direct = catalog.table("customer").filter(F.col("c_acctbal") > 9000.0).count()
    assert direct > 0
    assert len(rows) == direct
    assert all(float(r.v) > 9000.0 for r in rows)


def test_eav_temporal_value_predicate(catalog):
    """Temporal predicate over an EAV-bound var binds the v_ts column."""
    import datetime as dt

    from pyspark.sql import functions as F

    from crux_spark.datalog import q

    cut = dt.datetime(1998, 1, 1)
    df = q(
        catalog,
        {
            "find": ["?e"],
            "keys": ["e"],
            "where": [
                ["?e", "?a", "?v"],
                [["=", "?a", ":o_orderdate"]],
                [[">=", "?v", cut]],
            ],
        },
    )
    direct = (
        catalog.table("orders").filter(F.col("o_orderdate") >= F.lit(cut)).count()
    )
    assert direct > 0
    assert df.count() == direct


def test_rand_sample_aggregates(catalog):
    """True sampling aggregates (query.clj:351-366): `sample N` = N
    distinct values without replacement, `rand N` = N draws with
    replacement; seeded for reproducibility, different seeds give
    different draws."""
    from crux_spark.datalog import aggregates as agg

    spec = {
        "find": [["sample", 3, "?name", "s"], ["rand", 5, "?name", "r"]],
        "where": [["?n", ":n_name", "?name"]],
    }
    all_names = {
        r.n_name for r in catalog.table("nation").select("n_name").collect()
    }
    agg.set_sample_seed(42)
    try:
        a = q(catalog, spec).collect()[0]
        b = q(catalog, spec).collect()[0]
        # sample: 3 distinct members of the domain; deterministic per seed
        assert len(a.s) == 3 and len(set(a.s)) == 3 and set(a.s) <= all_names
        assert list(a.s) == list(b.s) and list(a.r) == list(b.r)
        # rand: 5 draws with replacement from the domain
        assert len(a.r) == 5 and set(a.r) <= all_names
        agg.set_sample_seed(7)
        c = q(catalog, spec).collect()[0]
        assert list(c.s) != list(a.s) or list(c.r) != list(a.r)
        # N >= domain size: sample returns the whole domain
        agg.set_sample_seed(1)
        full = q(
            catalog,
            {
                "find": [["sample", 500, "?name", "s"]],
                "where": [["?n", ":n_name", "?name"]],
            },
        ).collect()[0]
        assert set(full.s) == all_names
    finally:
        agg.set_sample_seed(None)


def test_q21_plan_shape_locked(spark):
    """Regression lock on the round-3 shared-subtree fix (VERDICT r2
    finding #4): full TPC-H q21 through the Datalog compiler must plan
    with few parquet scans and a base relation materialized ONCE and
    re-read as cached in-memory scans — never the 19-scan plan where
    every or-join/not-join branch recompiled the base join."""
    from crux_spark.plans import plan_facts
    from crux_spark.queries import QUERIES

    df = QUERIES["tpch_q21"](spark, "/root/testdata/sf0.001")
    facts = plan_facts(df)
    assert len(facts["scans"]) <= 6, facts["scans"]
    assert facts["checkpoint_reads"] >= 2  # shared base reused
    assert facts["shuffle_exchanges"] <= 8


def test_materialize_eav_single_scan(catalog, tmp_path):
    """Catalog.materialize_eav(): var-attribute scans read ONE
    attribute-partitioned parquet table instead of re-computing the
    N-table union per clause (the reference holds EAV natively in its
    index, index_store.clj AVE/AEV; this is the opt-in Spark
    equivalent). Asserts: same answers both ways, single FileScan in the
    materialized plan, attribute-partition pruning for fixed-a filters."""
    from pyspark.sql import functions as F

    from crux_spark.datalog import q

    query = {
        "find": ["?e", "?v"],
        "keys": ["e", "v"],
        "where": [
            ["?e", "?a", "?v"],
            [["=", "?a", ":c_acctbal"]],
            [[">", "?v", 9000.0]],
        ],
    }
    before = {(r.e, r.v) for r in q(catalog, query).collect()}

    path = catalog.materialize_eav(str(tmp_path / "eav"))
    assert catalog.materialize_eav() == path  # idempotent
    after_df = q(catalog, query)
    assert {(r.e, r.v) for r in after_df.collect()} == before

    plan = after_df._jdf.queryExecution().executedPlan().toString()
    # AQE's toString repeats the plan under "== Initial Plan =="; judge
    # the final section only
    final = plan.split("== Initial Plan ==")[0]
    # one scan of the materialized table; none of the base tables
    assert final.count("FileScan parquet") == 1, plan
    assert "eav" in final
    # fixed-attribute equality reached the scan as a partition filter
    assert ":c_acctbal" in final.split("PartitionFilters")[1].split("]")[0], plan

    # the pruned scan reads only the one attribute partition
    n_part = (
        catalog.eav_view().filter(F.col("a") == ":c_acctbal").count()
    )
    assert n_part == catalog.table("customer").filter(
        F.col("c_acctbal").isNotNull()
    ).count()


def test_eav_auto_materializes_past_table_threshold(spark):
    """A catalog past EAV_AUTO_MATERIALIZE_TABLES tables materializes its
    EAV view on first use WITHOUT an explicit materialize_eav() call —
    the default N-way union is a silent N-fold scan per var-attr clause
    on a wide catalog (r10 verdict #5). Opt-out per instance keeps the
    lazy union."""
    from crux_spark.catalog import Catalog
    from crux_spark.datalog import q

    def build(n):
        cat = Catalog(spark)
        for i in range(n):
            cat.add_documents(
                f"t{i}",
                spark.range(3).select(
                    F.concat(F.lit(f"e{i}_"), F.col("id")).alias("id"),
                    (F.col("id") + i * 10).alias("score"),
                ),
                id_col="id",
            )
        return cat

    query = {
        "find": ["?e", "?v"],
        "keys": ["e", "v"],
        "where": [["?e", "?a", "?v"], [["=", "?a", ":score"]]],
    }

    cat = build(10)
    df = q(cat, query)
    assert cat._eav_path is not None  # auto-materialized, no explicit call
    final = (
        df._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert final.count("FileScan parquet") == 1, final
    assert df.count() == 30

    # opt-out: the union path stays and answers identically
    cat2 = build(10)
    cat2.EAV_AUTO_MATERIALIZE_TABLES = None
    df2 = q(cat2, query)
    assert cat2._eav_path is None
    assert {tuple(r) for r in df2.collect()} == {
        tuple(r) for r in df.collect()
    }

    # at-or-under the threshold: no materialization write happens
    small = build(8)
    q(small, query).count()
    assert small._eav_path is None


def test_or_branch_literal_merge(catalog):
    """Or-branches identical except one literal collapse into a single
    set-literal (one-of) branch: SAME answers as the general union
    path, and the executed plan carries ONE copy of the branch joins
    instead of N (the N-branch union plan repeats every join per
    branch)."""
    from crux_spark.datalog import q
    from crux_spark.datalog.compile import Compiler

    # unit-level rewrites
    m = Compiler._try_merge_or_branches(
        [
            ["and", ["?r", ":r_regionkey", "?rk"], ["?r", ":r_name", "ASIA"]],
            ["and", ["?r", ":r_regionkey", "?rk"], ["?r", ":r_name", "EUROPE"]],
        ]
    )
    assert m == [
        ["and", ["?r", ":r_regionkey", "?rk"],
         ["?r", ":r_name", frozenset({"ASIA", "EUROPE"})]]
    ]
    # NOT merged: two clauses differ
    assert Compiler._try_merge_or_branches(
        [
            ["and", ["?r", ":r_name", "ASIA"], ["?r", ":r_regionkey", 1]],
            ["and", ["?r", ":r_name", "EUROPE"], ["?r", ":r_regionkey", 2]],
        ]
    ) is None
    # NOT merged: differing position is a variable in one branch
    assert Compiler._try_merge_or_branches(
        [["?r", ":r_name", "ASIA"], ["?r", ":r_name", "?x"]]
    ) is None
    # NOT merged: mixed literal types
    assert Compiler._try_merge_or_branches(
        [["?c", ":c_nationkey", 1], ["?c", ":c_nationkey", "x"]]
    ) is None
    # identical branches: redundant or collapses to one
    assert Compiler._try_merge_or_branches(
        [["?r", ":r_name", "ASIA"], ["?r", ":r_name", "ASIA"]]
    ) == [["and", ["?r", ":r_name", "ASIA"]]]

    # end-to-end: merged plan answers == manual union, one join not two
    query = {
        "find": ["?name"],
        "keys": ["n_name"],
        "where": [
            ["?n", ":n_name", "?name"],
            ["?n", ":n_regionkey", "?rk"],
            [
                "or-join", ["?rk"],
                ["and", ["?r", ":r_regionkey", "?rk"],
                 ["?r", ":r_name", "ASIA"]],
                ["and", ["?r", ":r_regionkey", "?rk"],
                 ["?r", ":r_name", "EUROPE"]],
            ],
        ],
    }
    df = q(catalog, query)
    got = sorted(r.n_name for r in df.collect())
    from pyspark.sql import functions as F

    n, r = catalog.table("nation"), catalog.table("region")
    exp = sorted(
        x.n_name
        for x in n.join(
            r.filter(F.col("r_name").isin("ASIA", "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_name").collect()
    )
    assert got == exp and got
    import re

    def n_joins(frame):
        frame.collect()
        final = (
            frame._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0]
        )
        return len(re.findall(r"BroadcastHashJoin|SortMergeJoin", final)), final

    merged_joins, merged_plan = n_joins(df)
    # the union of branches is gone from the merged plan
    assert "Union" not in merged_plan, merged_plan
    # and it carries strictly fewer joins than the general union path
    import crux_spark.datalog.compile as C

    # class access unwraps the staticmethod descriptor, so grab the
    # descriptor itself — restoring the bare function would rebind it
    # as an instance method and poison every later or-join compile
    real = C.Compiler.__dict__["_try_merge_or_branches"]
    C.Compiler._try_merge_or_branches = staticmethod(lambda branches: None)
    try:
        catalog._plan_cache = {}  # force recompile under the patch
        df_u = q(catalog, query)
        assert sorted(r.n_name for r in df_u.collect()) == got
        union_joins, union_plan = n_joins(df_u)
    finally:
        C.Compiler._try_merge_or_branches = real
        catalog._plan_cache = {}
    assert "Union" in union_plan, union_plan
    assert merged_joins < union_joins, (merged_joins, union_joins)


def test_plan_cache_reuse_and_invalidation(catalog, spark):
    """Argument-free queries hit the per-catalog compiled-plan LRU
    (query.clj:1993-2001); :in args skip it; registering a table
    invalidates it."""
    from crux_spark import Catalog

    query = {"find": ["?name"], "where": [["?n", ":n_name", "?name"]]}
    d1 = q(catalog, query)
    d2 = q(catalog, query)
    assert d1 is d2  # same compiled plan object
    # args-bearing queries are never cached
    qa = {"find": ["?name"], "in": ["?rk"],
          "where": [["?n", ":n_name", "?name"],
                    ["?n", ":n_regionkey", "?rk"]]}
    a1, a2 = q(catalog, qa, 1), q(catalog, qa, 2)
    assert a1 is not a2
    assert a1.count() != a2.count() or rows(a1) != rows(a2)
    # registration invalidates: a fresh catalog answers with new state
    c2 = Catalog(spark)
    c2.add_documents(
        "ppl", spark.createDataFrame([("a", "Ann")], "id string, n_name string"),
        id_col="id",
    )
    p1 = q(c2, query)
    assert [r.name for r in p1.collect()] == ["Ann"]
    # re-registering the collection must invalidate the cached plan —
    # a stale hit would keep answering ["Ann"]
    c2.add_documents(
        "ppl",
        spark.createDataFrame(
            [("a", "Ann"), ("b", "Bob")], "id string, n_name string"
        ),
        id_col="id",
    )
    p2 = q(c2, query)
    assert p1 is not p2
    assert sorted(r.name for r in p2.collect()) == ["Ann", "Bob"]


def test_mixed_type_value_total_order(spark):
    """codec_test.clj's ordering property over a heterogeneous EAV
    attribute: values sort by type tag first — boolean < long < double <
    date < string (codec.clj:81-99 tag ids 4..8) — then by typed value
    within the tag, never by the stringified value (under which "0.5" <
    "10" < "Apple" < "true" would interleave the types)."""
    import datetime as dt

    from crux_spark import Catalog
    from crux_spark.datalog import q

    cat = Catalog(spark)
    cat.add_documents(
        "t_long",
        spark.createDataFrame([("l1", 900), ("l2", 12)], "_id string, val long"),
    )
    cat.add_documents(
        "t_dbl",
        spark.createDataFrame(
            [("d1", 0.5), ("d2", 9000.25)], "_id string, val double"
        ),
    )
    cat.add_documents(
        "t_str",
        spark.createDataFrame(
            [("s1", "10"), ("s2", "Apple")], "_id string, val string"
        ),
    )
    cat.add_documents(
        "t_bool",
        spark.createDataFrame(
            [("b1", True), ("b2", False)], "_id string, val boolean"
        ),
    )
    cat.add_documents(
        "t_ts",
        spark.createDataFrame(
            [("t1", dt.datetime(2020, 1, 1)), ("t2", dt.datetime(1999, 6, 1))],
            "_id string, val timestamp",
        ),
    )

    query = {
        "find": ["?e", "?v"],
        "keys": ["e", "v"],
        "where": [["?e", "?a", "?v"], [["=", "?a", ":val"]]],
        "order-by": [["?v", "asc"]],
    }
    got = [r.e for r in q(cat, query).collect()]
    assert got == ["b2", "b1", "l2", "l1", "d1", "d2", "t2", "t1", "s1", "s2"]

    desc = dict(query, **{"order-by": [["?v", "desc"]]})
    assert [r.e for r in q(cat, desc).collect()] == list(reversed(got))


def test_mixed_type_order_property(spark):
    """Randomized round-trips of the same property: engine order over a
    mixed-type attribute == python sort by (type tag, typed value)."""
    import random

    from crux_spark import Catalog
    from crux_spark.datalog import q

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        longs = rng.sample(range(-10_000, 10_000), 6)
        dbls = [rng.uniform(-1e4, 1e4) for _ in range(6)]
        strs = [f"s{rng.randrange(10**6)}" for _ in range(6)]
        cat = Catalog(spark)
        cat.add_documents(
            "ml",
            spark.createDataFrame(
                [(f"L{i}", v) for i, v in enumerate(longs)], "_id string, val long"
            ),
        )
        cat.add_documents(
            "md",
            spark.createDataFrame(
                [(f"D{i}", v) for i, v in enumerate(dbls)], "_id string, val double"
            ),
        )
        cat.add_documents(
            "ms",
            spark.createDataFrame(
                [(f"S{i}", v) for i, v in enumerate(strs)], "_id string, val string"
            ),
        )
        got = [
            r.e
            for r in q(
                cat,
                {
                    "find": ["?e", "?v"],
                    "keys": ["e", "v"],
                    "where": [["?e", "?a", "?v"], [["=", "?a", ":val"]]],
                    "order-by": [["?v", "asc"]],
                },
            ).collect()
        ]
        expect = (
            [f"L{i}" for i in sorted(range(6), key=lambda i: longs[i])]
            + [f"D{i}" for i in sorted(range(6), key=lambda i: dbls[i])]
            + [f"S{i}" for i in sorted(range(6), key=lambda i: strs[i])]
        )
        assert got == expect, f"seed {seed}"


def test_join_all_early_projection_dedup(spark):
    """Set-semantics early dedup (join_all keep=...): existential vars
    drop as soon as no remaining relation needs them and the prefix
    dedups — a fan-out middle hop must not multiply the final distinct
    pairs, and the intermediate plan must show the inserted aggregate."""
    from crux_spark.catalog import Catalog
    from crux_spark.datalog.compile import Compiler, var_col

    cat = Catalog(spark)
    comp = Compiler(cat, [], {})
    a = spark.createDataFrame(
        [(1, i) for i in range(4)], [var_col("?u"), var_col("?v")]
    )
    b = spark.createDataFrame(
        [(i, 7) for i in range(4)], [var_col("?v"), var_col("?w")]
    )
    out = comp.join_all([a, b], keep={var_col("?u"), var_col("?w")})
    assert sorted(out.columns) == sorted([var_col("?u"), var_col("?w")])
    rows = out.collect()
    # 4 paths from u=1 to w=7 through 4 distinct v — deduped to ONE row
    # inside the chain, not just at the end
    assert [(r[0], r[1]) for r in rows] == [(1, 7)]
    # without the hint the bag keeps all 4 paths (pre-change behavior)
    assert comp.join_all([a, b]).count() == 4


def test_scan_order_prefers_literal_constraints(spark):
    """Selective scans join first: a query whose LAST clause carries the
    only literal gets that scan as the chain seed (scan-score sort is
    stable, so unconstrained queries keep clause order)."""
    from crux_spark.catalog import Catalog
    from crux_spark.datalog import q

    cat = Catalog(spark)
    cat.add_documents(
        "people",
        spark.createDataFrame(
            [("p1", "ann", "paris"), ("p2", "bob", "oslo"), ("p3", "cyd", "paris")],
            "_id string, name string, city string",
        ),
    )
    # correctness is unchanged regardless of order
    rows = q(
        cat,
        {
            "find": ["?n"],
            "keys": ["n"],
            "where": [
                ["?p", ":name", "?n"],
                ["?p", ":city", "paris"],
            ],
        },
    ).collect()
    assert sorted(r.n for r in rows) == ["ann", "cyd"]
    # and the scorer itself ranks the literal-filtered scan higher
    from crux_spark.datalog.compile import Compiler

    comp = Compiler(cat, [], {})
    scans = comp.scan_group("?p", [(":name", "?n")]) + comp.scan_group(
        "?p", [(":city", "paris")]
    )
    scores = [comp._scan_scores.get(id(s), 0) for s in scans]
    assert scores == [0, 1]


def test_nanos_detection_recurses_partitioned_layout(tmp_path):
    """r10 advice: Hive-partitioned layouts (bucket=*/part-*.parquet, as
    TxStore.save writes) have no top-level *.parquet, so the nanos
    footer probe must recurse instead of silently returning []."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crux_spark.catalog import _nanos_ts_columns

    sub = tmp_path / "events.parquet" / "bucket=0"
    sub.mkdir(parents=True)
    tbl = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([1_700_000_000_000_000_000,
                        1_700_000_000_000_000_001],
                       pa.timestamp("ns")),
    })
    pq.write_table(tbl, sub / "part-00000.parquet")
    assert _nanos_ts_columns(str(tmp_path / "events.parquet")) == ["ts"]
    # flat layout still detected via the top-level glob
    flat = tmp_path / "flat.parquet"
    flat.mkdir()
    pq.write_table(tbl, flat / "part-00000.parquet")
    assert _nanos_ts_columns(str(flat)) == ["ts"]


def _mixed_catalog(spark):
    import datetime as dt
    from decimal import Decimal

    from crux_spark import Catalog

    cat = Catalog(spark)
    mk = lambda rows, ddl, name: cat.add_documents(
        name, spark.createDataFrame(rows, ddl), id_col="id")
    mk([(f"L{i}", v) for i, v in enumerate([100, 2, 512, 10, 33])],
       "id string, val long", "m_long")
    mk([(f"D{i}", v) for i, v in enumerate([4.25, 0.5, 5.5, 1.75, 3.0])],
       "id string, val double", "m_double")
    mk([(f"I{i}", dt.datetime(2024, 1, 1) + dt.timedelta(days=i))
        for i in range(5)], "id string, val timestamp", "m_ts")
    mk([(f"S{i}", v) for i, v in enumerate(["Zeta", "B10", "m", "B2",
                                            "alpha"])],
       "id string, val string", "m_str")
    mk([(f"C{i}", Decimal(v)) for i, v in enumerate(
        ["33.40", "1.10", "512.99", "2.25", "100.05"])],
       "id string, val decimal(18,2)", "m_dec")
    mk([(f"T{i}", dt.date(2024, 2, 1) + dt.timedelta(days=3 * i))
        for i in range(5)], "id string, val date", "m_date")
    mk([(f"U{i}", dt.timedelta(seconds=s)) for i, s in enumerate(
        [90, 5, 86400 * 2, 3600, 20])],
       "id string, val interval day to second", "m_dur")
    return cat


def test_eav_cross_type_total_order_extended(spark):
    """r10 verdict #2: the codec's cross-type total order must cover
    decimal (tag 11), localdate (tag 14), and duration (tag 18) —
    codec.clj:282-354. They sort AFTER strings (a stringified or
    double-collapsed encoding puts '1.10' before 'B10' or mixes decimals
    into doubles); within each tag the order is the typed value's."""
    from crux_spark.datalog import q

    cat = _mixed_catalog(spark)
    base = [["?e", "?a", "?v"], [["=", "?a", ":val"]]]
    vals = [r[0] for r in q(cat, {
        "find": ["?v"], "where": base, "order-by": [["?v", "asc"]],
    }).collect()]
    assert vals == [
        # long (5), numeric order — '100' < '2' lexically, so a
        # string sort fails here
        "2", "10", "33", "100", "512",
        # double (6)
        "0.5", "1.75", "3.0", "4.25", "5.5",
        # timestamp (7)
        "2024-01-01 00:00:00", "2024-01-02 00:00:00",
        "2024-01-03 00:00:00", "2024-01-04 00:00:00",
        "2024-01-05 00:00:00",
        # string (8), binary order: uppercase < lowercase, '10' < '2'
        "B10", "B2", "Zeta", "alpha", "m",
        # decimal (11) — after strings, numeric within
        "1.100000000000", "2.250000000000", "33.400000000000",
        "100.050000000000", "512.990000000000",
        # localdate (14)
        "2024-02-01", "2024-02-04", "2024-02-07", "2024-02-10",
        "2024-02-13",
        # duration (18), by length not by string
        "INTERVAL '0 00:00:05' DAY TO SECOND",
        "INTERVAL '0 00:00:20' DAY TO SECOND",
        "INTERVAL '0 00:01:30' DAY TO SECOND",
        "INTERVAL '0 01:00:00' DAY TO SECOND",
        "INTERVAL '2 00:00:00' DAY TO SECOND",
    ]


def test_eav_range_constraint_type_confinement(spark):
    """query.clj:870-884: a range constraint over an EAV-bound var wraps
    in prefix-equal on the 1-byte type tag — [(< ?v 5)] with a long
    literal matches LONGS below 5 only, never doubles/decimals/dates
    that would compare below it numerically or lexically."""
    import datetime as dt
    from decimal import Decimal

    from crux_spark.datalog import q

    cat = _mixed_catalog(spark)
    base = [["?e", "?a", "?v"], [["=", "?a", ":val"]]]

    def vals(pred):
        return sorted(r[0] for r in q(cat, {
            "find": ["?v"], "where": base + [[pred]]}).collect())

    assert vals(["<", "?v", 50]) == ["10", "2", "33"]
    assert vals([">=", "?v", 3.0]) == ["3.0", "4.25", "5.5"]
    assert vals(["<", "?v", Decimal("100.00")]) == [
        "1.100000000000", "2.250000000000", "33.400000000000"]
    assert vals(["<", "?v", dt.date(2024, 2, 6)]) == [
        "2024-02-01", "2024-02-04"]
    assert vals(["<", "?v", dt.datetime(2024, 1, 3)]) == [
        "2024-01-01 00:00:00", "2024-01-02 00:00:00"]
    assert vals(["<", "?v", "alpha"]) == ["B10", "B2", "Zeta"]
    assert vals(["<", "?v", dt.timedelta(minutes=30)]) == [
        "INTERVAL '0 00:00:05' DAY TO SECOND",
        "INTERVAL '0 00:00:20' DAY TO SECOND",
        "INTERVAL '0 00:01:30' DAY TO SECOND"]
    # literal-in-value-position equality is confined the same way
    # (var-attr scan: an int literal matches v_long, never an interval
    # or decimal row)
    res = q(cat, {"find": ["?e"],
                  "where": [["?e", "?a", 33], [["=", "?a", ":val"]]]})
    assert [r[0] for r in res.collect()] == ["L4"]


def _full_spectrum_catalog(spark):
    """_mixed_catalog + the r12 classes: char(9), bigint(12),
    localtime(15), localdatetime(16), instant(17) — the non-native
    Spark carriers opt in via StructField metadata (valuetypes.py)."""
    import datetime as dt

    from crux_spark.valuetypes import time_to_nanos

    cat = _mixed_catalog(spark)
    meta = lambda df, m: df.withMetadata("val", m)
    cat.add_documents("m_char", meta(spark.createDataFrame(
        [(f"H{i}", v) for i, v in enumerate(["q", "a", "z", "C", "m"])],
        "id string, val string"), {"crux_type": "char"}), id_col="id")
    cat.add_documents("m_bigint", meta(spark.createDataFrame(
        [(f"B{i}", v) for i, v in enumerate(
            ["98765432109876543210", "12345678901234567890123", "7",
             "31415926535897932384626433", "1000000000000000000000"])],
        "id string, val string").selectExpr(
            "id", "CAST(val AS DECIMAL(38,0)) AS val"),
        {"crux_type": "bigint"}), id_col="id")
    cat.add_documents("m_time", meta(spark.createDataFrame(
        [(f"M{i}", time_to_nanos(v)) for i, v in enumerate(
            [dt.time(13, 30, 59), dt.time(0, 0, 1), dt.time(23, 59, 59),
             dt.time(7, 15), dt.time(12, 0)])],
        "id string, val long"), {"crux_type": "localtime"}), id_col="id")
    cat.add_documents("m_ldt", meta(spark.createDataFrame(
        [(f"N{i}", dt.datetime(2024, 3, 1, 7, 30) + dt.timedelta(days=i))
         for i in range(5)], "id string, val timestamp_ntz"),
        {"crux_type": "localdatetime"}), id_col="id")
    cat.add_documents("m_inst", meta(spark.createDataFrame(
        [(f"P{i}", dt.datetime(2023, 12, 31, 18) + dt.timedelta(hours=i))
         for i in range(5)], "id string, val timestamp"),
        {"crux_type": "instant"}), id_col="id")
    return cat


def test_eav_full_codec_tag_spectrum_order(spark):
    """r11 verdict #4: the cross-type total order spans the FULL codec
    tag spectrum — char(9, codec.clj:258-263) after strings, bigint(12,
    :189-207) after bigdec and numeric within (a bigint 7 does NOT sort
    among longs), localtime(15)/localdatetime(16)/instant(17,
    :312-347) between localdate and duration, with Instant DISTINCT
    from the Date class (tag 7) — an instant sorts after strings, a
    plain timestamp before them."""
    from crux_spark.datalog import q

    cat = _full_spectrum_catalog(spark)
    base = [["?e", "?a", "?v"], [["=", "?a", ":val"]]]
    es = [r[0] for r in q(cat, {
        "find": ["?e", "?v"], "where": base, "order-by": [["?v", "asc"]],
    }).collect()]
    tags = [e[0] for e in es]
    # group order = codec tag order (L=long D=double I=ts S=str H=char
    # C=dec B=bigint T=date M=time N=ldt P=inst U=duration)
    assert tags == (
        ["L"] * 5 + ["D"] * 5 + ["I"] * 5 + ["S"] * 5 + ["H"] * 5
        + ["C"] * 5 + ["B"] * 5 + ["T"] * 5 + ["M"] * 5 + ["N"] * 5
        + ["P"] * 5 + ["U"] * 5
    )
    # within-tag orders for the new classes
    assert es[20:25] == ["H3", "H1", "H4", "H0", "H2"]  # C a m q z
    assert es[30:35] == ["B2", "B0", "B4", "B1", "B3"]  # numeric bigint
    assert es[40:45] == ["M1", "M3", "M4", "M0", "M2"]  # time of day
    assert es[50:55] == [f"P{i}" for i in range(5)]     # instant


def test_eav_full_spectrum_range_confinement_and_literals(spark):
    """Range constraints confine to the LITERAL's codec class for the
    r12 classes too (query.clj:870-884), and literal-in-value-position
    matches within the class: Char never matches a string row, BigInt
    never a long row, a time literal only localtime rows."""
    import datetime as dt

    from crux_spark.datalog import q
    from crux_spark.valuetypes import BigInt, Char

    cat = _full_spectrum_catalog(spark)
    base = [["?e", "?a", "?v"], [["=", "?a", ":val"]]]

    def es(pred):
        return sorted(r[0] for r in q(cat, {
            "find": ["?e"], "where": base + [[pred]]}).collect())

    # bigint literal -> bigint rows only (long 2/10/33 excluded even
    # though numerically below; bigint 7 and 9.87e19 match)
    assert es(["<", "?v", BigInt(10**21)]) == ["B0", "B2"]
    # huge PLAIN int literal promotes to the bigint class (EDN reader)
    assert es(["<", "?v", 10**21]) == ["B0", "B2"]
    # localtime literal -> localtime rows only
    assert es(["<", "?v", dt.time(12, 0)]) == ["M1", "M3"]
    # char literal equality -> the char row, NOT the string row "m"
    res = q(cat, {"find": ["?e"],
                  "where": [["?e", "?a", Char("m")], [["=", "?a", ":val"]]]})
    assert [r[0] for r in res.collect()] == ["H4"]
    # plain string "m" still finds only the string row
    res = q(cat, {"find": ["?e"],
                  "where": [["?e", "?a", "m"], [["=", "?a", ":val"]]]})
    assert [r[0] for r in res.collect()] == ["S2"]
    # a time literal in value position matches the localtime row only
    res = q(cat, {"find": ["?e"],
                  "where": [["?e", "?a", dt.time(12, 0)],
                            [["=", "?a", ":val"]]]})
    assert [r[0] for r in res.collect()] == ["M4"]


def test_eav_full_spectrum_order_property(spark):
    """Randomized full-spectrum ordering property: engine order over a
    mixed attribute carrying ALL thirteen codec classes == python sort
    by (type tag, typed value) — three seeds, values drawn fresh each
    time (the deterministic spectrum test above pins the boundaries;
    this pins the within-tag orders against an independent comparator)."""
    import datetime as dt
    import random
    from decimal import Decimal

    from crux_spark import Catalog
    from crux_spark.datalog import q
    from crux_spark.valuetypes import time_to_nanos

    for seed in (5, 41):
        rng = random.Random(seed)
        expected = []  # (tag, sortable, eid)
        cat = Catalog(spark)

        def add(name, rows, ddl, tag, key=lambda v: v, meta=None):
            df = spark.createDataFrame(rows, ddl)
            if meta:
                df = df.withMetadata("val", meta)
            cat.add_documents(name, df, id_col="id")
            for eid, v in rows:
                expected.append((tag, key(v), eid))

        # distinct draws per class: equal values tie in the engine's
        # order (nondeterministic between rows) but a python stable sort
        # would fix an arbitrary winner
        d4 = lambda pop: rng.sample(pop, 4)
        add("p_long", [(f"L{i}", v) for i, v in enumerate(
            d4(range(-9999, 9999)))], "id string, val long", 5)
        add("p_dbl", [(f"D{i}", v / 7.0) for i, v in enumerate(
            d4(range(-10**6, 10**6)))], "id string, val double", 6)
        add("p_ts", [(f"I{i}", dt.datetime(2020, 1, 1)
                      + dt.timedelta(hours=h)) for i, h in enumerate(
            d4(range(10**4)))], "id string, val timestamp", 7)
        add("p_str", [(f"S{i}", f"s{v}") for i, v in enumerate(
            d4(range(10**6)))], "id string, val string", 8)
        add("p_char", [(f"H{i}", c) for i, c in enumerate(
            d4("azAZ09bcDE"))],
            "id string, val string", 9, meta={"crux_type": "char"})
        add("p_dec", [(f"C{i}", Decimal(v) / 100) for i, v in enumerate(
            d4(range(-10**6, 10**6)))], "id string, val decimal(18,2)", 11)
        add("p_big", [(f"B{i}", Decimal(v)) for i, v in enumerate(
            d4(range(-10**9, 10**9)))],
            "id string, val decimal(38,0)", 12, meta={"crux_type": "bigint"})
        add("p_date", [(f"T{i}", dt.date(2024, 1, 1)
                        + dt.timedelta(days=d)) for i, d in enumerate(
            d4(range(3000)))], "id string, val date", 14)
        add("p_time", [(f"M{i}", time_to_nanos(
                dt.time(s // 3600, (s % 3600) // 60, s % 60)))
                       for i, s in enumerate(d4(range(86400)))],
            "id string, val long", 15, meta={"crux_type": "localtime"})
        add("p_ldt", [(f"N{i}", dt.datetime(2024, 1, 1)
                       + dt.timedelta(minutes=m)) for i, m in enumerate(
            d4(range(10**5)))], "id string, val timestamp_ntz",
            16, meta={"crux_type": "localdatetime"})
        add("p_inst", [(f"P{i}", dt.datetime(2024, 1, 1)
                        + dt.timedelta(seconds=s)) for i, s in enumerate(
            d4(range(10**7)))], "id string, val timestamp", 17,
            meta={"crux_type": "instant"})
        add("p_dur", [(f"U{i}", dt.timedelta(seconds=s)) for i, s in
                      enumerate(d4(range(10**6)))],
            "id string, val interval day to second", 18)

        got = [r[0] for r in q(cat, {
            "find": ["?e", "?v"],
            "where": [["?e", "?a", "?v"], [["=", "?a", ":val"]]],
            "order-by": [["?v", "asc"]],
        }).collect()]
        want = [e for _, _, e in sorted(
            expected, key=lambda t: (t[0], t[1]))]
        assert got == want, f"seed {seed}"


def test_auto_eav_deletion_is_deferred(spark):
    """r12 advice: lazy DataFrames returned to callers may still
    reference a superseded auto-EAV dir — registering a new table must
    NOT delete it out from under them. The dir is retired to a deferred
    queue (reclaimed one materialization cycle later, or explicitly via
    reclaim_stale_eav)."""
    import os

    from crux_spark.catalog import Catalog
    from crux_spark.datalog import q

    cat = Catalog(spark)
    for i in range(10):
        cat.add_documents(
            f"t{i}",
            spark.range(3).select(
                F.concat(F.lit(f"e{i}_"), F.col("id")).alias("id"),
                (F.col("id") + i * 10).alias("score"),
            ),
            id_col="id",
        )
    query = {
        "find": ["?e", "?v"],
        "keys": ["e", "v"],
        "where": [["?e", "?a", "?v"], [["=", "?a", ":score"]]],
    }
    df_old = q(cat, query)  # triggers auto-materialization
    old_dir = cat._eav_auto_dir
    assert old_dir and os.path.exists(old_dir)

    # registering a new table retires the dir but must not delete it
    cat.add_documents(
        "t_extra",
        spark.range(2).select(
            F.concat(F.lit("x"), F.col("id")).alias("id"),
            F.col("id").alias("score"),
        ),
        id_col="id",
    )
    assert os.path.exists(old_dir)
    assert df_old.count() == 30  # the lazy frame still collects

    # explicit reclaim removes it
    cat.reclaim_stale_eav()
    assert not os.path.exists(old_dir)
