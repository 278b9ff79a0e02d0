"""Model-based generative testing of the Datalog core — the analogue of
the reference's test.check layer over the query/index stack (SURVEY §5;
kv_test.clj / index_store_test.clj use clojure.test.check the same way):
hypothesis generates small documents and random conjunctive queries, and
the Spark engine's answers are compared against a brute-force pure-Python
evaluator over the same documents.
"""

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from crux_spark import Catalog
from crux_spark.datalog import q

ENTITIES = [f"e{i}" for i in range(5)]
ATTRS = ["a", "b"]          # int-valued
REF_ATTR = "r"              # entity-valued (join attribute)

docs_strategy = st.fixed_dictionaries(
    {
        e: st.fixed_dictionaries(
            {
                "a": st.one_of(st.none(), st.integers(0, 3)),
                "b": st.one_of(st.none(), st.integers(0, 3)),
                "r": st.one_of(st.none(), st.sampled_from(ENTITIES)),
            }
        )
        for e in ENTITIES
    }
)

# clause shapes: (kind, ...) — rendered against a var pool v0..v2
clause_strategy = st.one_of(
    # [?x :attr ?y]
    st.tuples(st.just("av"), st.sampled_from(["v0", "v1"]),
              st.sampled_from(ATTRS), st.sampled_from(["v1", "v2"])),
    # [?x :attr literal]
    st.tuples(st.just("alit"), st.sampled_from(["v0", "v1"]),
              st.sampled_from(ATTRS), st.integers(0, 3)),
    # [?x :r ?y] entity join
    st.tuples(st.just("ref"), st.sampled_from(["v0", "v1"]),
              st.just(REF_ATTR), st.sampled_from(["v1", "v2"])),
    # [(< ?x k)] comparison over an int var
    st.tuples(st.just("cmp"), st.sampled_from(["<", ">", "<=", ">="]),
              st.sampled_from(["v1", "v2"]), st.integers(0, 3)),
    # (not [?x :attr lit]) — correlated negation
    st.tuples(st.just("neg"), st.sampled_from(["v0", "v1"]),
              st.sampled_from(ATTRS), st.integers(0, 3)),
    # (or [?x :a lit] [?x :b lit]) — disjunction over one entity var
    st.tuples(st.just("or2"), st.sampled_from(["v0", "v1"]),
              st.integers(0, 3), st.integers(0, 3)),
    # (not [?x :r ?y]) — correlated negation over a JOIN (both vars
    # bound outside; exercises branch alpha-renaming + anti-join seeds)
    st.tuples(st.just("negref"), st.sampled_from(["v0", "v1"]),
              st.sampled_from(["v1", "v2"])),
)

query_strategy = st.lists(clause_strategy, min_size=1, max_size=3)


def query_vars(clauses: list) -> list:
    return sorted(
        {c[1] for c in clauses if c[0] != "cmp"}
        | {c[3] for c in clauses if c[0] in ("av", "ref")}
        | {c[2] for c in clauses if c[0] in ("cmp", "negref")}
    )


def brute_force(docs: dict, clauses: list) -> set:
    """Enumerate all assignments of the query's vars over the value
    universe and keep those satisfying every clause — the semantics
    oracle. Var domain: entity ids + int values."""
    used = query_vars(clauses)
    universe = ENTITIES + list(range(0, 4))
    out = set()
    for combo in itertools.product(universe, repeat=len(used)):
        env = dict(zip(used, combo))
        ok = True
        for c in clauses:
            if c[0] in ("av", "alit", "ref"):
                _, ev, attr, v = c
                e = env[ev]
                if not isinstance(e, str) or e not in docs:
                    ok = False
                    break
                stored = docs[e].get(attr)
                want = env[v] if (c[0] != "alit") else v
                if stored is None or stored != want:
                    ok = False
                    break
            elif c[0] == "neg":
                _, ev, attr, lit = c
                e = env[ev]
                if not isinstance(e, str) or e not in docs:
                    ok = False
                    break
                if docs[e].get(attr) == lit:
                    ok = False
                    break
            elif c[0] == "negref":
                _, xv, yv = c
                x, y = env[xv], env[yv]
                if not isinstance(x, str) or x not in docs:
                    ok = False
                    break
                if docs[x].get("r") == y:
                    ok = False
                    break
            elif c[0] == "or2":
                _, ev, la, lb = c
                e = env[ev]
                if not isinstance(e, str) or e not in docs:
                    ok = False
                    break
                if not (docs[e].get("a") == la or docs[e].get("b") == lb):
                    ok = False
                    break
            else:
                _, op, v, k = c
                x = env[v]
                if not isinstance(x, int):
                    ok = False
                    break
                if not {"<": x < k, ">": x > k, "<=": x <= k, ">=": x >= k}[op]:
                    ok = False
                    break
        if ok:
            out.add(tuple(env[v] for v in used))
    return out


def to_datalog(clauses: list) -> tuple[dict, list]:
    used = query_vars(clauses)
    where = []
    for c in clauses:
        if c[0] == "av" or c[0] == "ref":
            where.append([f"?{c[1]}", f":{c[2]}", f"?{c[3]}"])
        elif c[0] == "alit":
            where.append([f"?{c[1]}", f":{c[2]}", c[3]])
        elif c[0] == "neg":
            where.append(["not", [f"?{c[1]}", f":{c[2]}", c[3]]])
        elif c[0] == "or2":
            where.append(
                ["or", [f"?{c[1]}", ":a", c[2]], [f"?{c[1]}", ":b", c[3]]]
            )
        elif c[0] == "negref":
            where.append(["not", [f"?{c[1]}", ":r", f"?{c[2]}"]])
        else:
            where.append([[c[1], f"?{c[2]}", c[3]]])
    return {"find": [f"?{v}" for v in used], "where": where}, used


@pytest.fixture(scope="module")
def prop_spark(spark):
    return spark


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy, clauses=query_strategy)
@pytest.mark.full
def test_conjunctive_queries_match_brute_force(prop_spark, docs, clauses):
    spark = prop_spark
    # var typing soundness: our typed-column engine can't bind one var to
    # both an int attr and the ref attr — skip those (the brute-force
    # oracle would return empty there anyway, but the engine raises on
    # cross-type joins by design)
    int_vars = {c[3] for c in clauses if c[0] == "av"} | {
        c[2] for c in clauses if c[0] == "cmp"
    }
    ent_vars = (
        {c[1] for c in clauses if c[0] != "cmp"}
        | {c[3] for c in clauses if c[0] == "ref"}
        | {c[2] for c in clauses if c[0] == "negref"}
    )
    if int_vars & ent_vars:
        return
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("a", T.LongType()),
            T.StructField("b", T.LongType()),
            T.StructField("r", T.StringType()),
        ]
    )
    rows = [(e, d["a"], d["b"], d["r"]) for e, d in docs.items()]
    cat = Catalog(spark)
    cat.add_documents("docs", spark.createDataFrame(rows, schema), id_col="id")
    query, used = to_datalog(clauses)
    # only positive clauses BIND vars; neg/cmp consume them
    bound = {c[1] for c in clauses if c[0] in ("av", "alit", "ref", "or2")} | {
        c[3] for c in clauses if c[0] in ("av", "ref")
    }
    unbound_consumer = any(
        (c[0] == "cmp" and c[2] not in bound)
        or (c[0] == "neg" and c[1] not in bound)
        or (c[0] == "negref" and not (c[1] in bound and c[2] in bound))
        for c in clauses
    )
    if unbound_consumer:
        # a comparison/negation over a var no scan binds has an unbounded
        # domain: the engine must REJECT it (the brute-force model only
        # "answers" because it bounds the universe artificially)
        with pytest.raises(Exception):
            q(cat, query).collect()
        return
    expected = brute_force(docs, clauses)
    got = {tuple(r) for r in q(cat, query).collect()}
    assert got == expected, (clauses, docs)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    docs=docs_strategy,
    sel=st.lists(st.sampled_from(["a", "b"]), min_size=1, max_size=2, unique=True),
    lit_filter=st.one_of(
        st.none(), st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 3))
    ),
)
def test_sql_table_fast_path_matches_datalog(prop_spark, docs, sel, lit_filter):
    """The single-scan SQL-table fast path (sql._compile_table_spec) must
    agree with the full Datalog compiler on every generated single-entity
    spec (same attribute-required semantics)."""
    from crux_spark.sql import _compile_table_spec

    spark = prop_spark
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("a", T.LongType()),
            T.StructField("b", T.LongType()),
        ]
    )
    rows = [(e, d["a"], d["b"]) for e, d in docs.items()]
    cat = Catalog(spark)
    cat.add_documents("docs", spark.createDataFrame(rows, schema), id_col="id")

    where = [["?id", f":{attr}", f"?{attr}"] for attr in sel]
    if lit_filter is not None:
        where.append(["?id", f":{lit_filter[0]}", lit_filter[1]])
    spec = {"find": ["?id"] + [f"?{attr}" for attr in sel], "where": where}

    fast = _compile_table_spec(cat, spec, q)
    full = q(cat, spec)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, full.collect())), spec


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs=docs_strategy, clauses=query_strategy)
def test_projected_find_matches_brute_force(prop_spark, docs, clauses):
    """Same universe, but :find projects a strict SUBSET of the bound
    vars — the exact shape where the set-semantics early projection +
    dedup rewrite (join_all keep=...) fires. The engine's distinct
    projected set must equal the brute-force result projected onto the
    same vars."""
    spark = prop_spark
    int_vars = {c[3] for c in clauses if c[0] == "av"} | {
        c[2] for c in clauses if c[0] == "cmp"
    }
    ent_vars = (
        {c[1] for c in clauses if c[0] != "cmp"}
        | {c[3] for c in clauses if c[0] == "ref"}
        | {c[2] for c in clauses if c[0] == "negref"}
    )
    if int_vars & ent_vars:
        return
    bound = {c[1] for c in clauses if c[0] in ("av", "alit", "ref", "or2")} | {
        c[3] for c in clauses if c[0] in ("av", "ref")
    }
    unbound_consumer = any(
        (c[0] == "cmp" and c[2] not in bound)
        or (c[0] == "neg" and c[1] not in bound)
        or (c[0] == "negref" and not (c[1] in bound and c[2] in bound))
        for c in clauses
    )
    if unbound_consumer or len(bound) < 2:
        return  # nothing to project away
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("a", T.LongType()),
            T.StructField("b", T.LongType()),
            T.StructField("r", T.StringType()),
        ]
    )
    rows = [(e, d["a"], d["b"], d["r"]) for e, d in docs.items()]
    cat = Catalog(spark)
    cat.add_documents("docs", spark.createDataFrame(rows, schema), id_col="id")
    query, used = to_datalog(clauses)
    keep = sorted(bound)[: len(bound) // 2] or sorted(bound)[:1]
    query["find"] = [f"?{v}" for v in keep]
    expected = {
        tuple(row[used.index(v)] for v in keep)
        for row in brute_force(docs, clauses)
    }
    got = {tuple(r) for r in q(cat, query).collect()}
    assert got == expected, (clauses, keep, docs)
