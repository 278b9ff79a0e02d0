"""Port of the reference's Lucene multi-field corpus
(crux-lucene/test/crux/lucene/multi_field_test.clj) onto the
``lucene-text-search`` pred constraint: QueryParser-style
``field:term`` booleans over every string attribute.

Covered: single-field match, OR across fields, no-match, %s format
args from :in-bound vars (test-bindings / test-use-in-argument),
namespaced field names with escapes (test-namespaced-keywords),
eviction dropping docs from the searchable snapshot (test-evict),
malformed queries raising the ParseException analogue
(test-malformed-query), the must-be-String error, and dynamically
constructed OR-of-fields wildcard strings
(test-construct-or-fields-dynamically).
"""

import pytest

from crux_spark.node import Node

SCHEMA = (
    "id string, firstname string, surname string, name string"
)


def mknode(spark, docs):
    n = Node(spark, schema=SCHEMA)
    if docs:
        n.submit_tx([("put", d) for d in docs])
        n.await_tx()
    return n


def eids(db, query, *args, in_vars=()):
    # format args are the :in vars EXCEPT when the query itself is the
    # (single) :in-bound var, e.g. (lucene-text-search ?s)
    fmt = [v for v in in_vars if v != query]
    q = {"find": ["?e"],
         "where": [[["lucene-text-search", query, *fmt], [["?e"]]]]}
    if in_vars:
        q["in"] = list(in_vars)
    return sorted(r.e for r in db.q(q, *args).collect())


def test_multi_field_lucene_queries(spark):
    node = mknode(
        spark, [{"id": "ivan", "firstname": "Fred", "surname": "Smith"}]
    )
    db = node.db()
    assert eids(db, "firstname: Fred") == ["ivan"]
    assert eids(db, "firstname:James OR surname:smith") == ["ivan"]
    assert eids(db, "firstname:James OR surname:preston") == []


def test_bindings(spark):
    node = mknode(
        spark, [{"id": "ivan", "firstname": "Fred", "surname": "Smith"}]
    )
    db = node.db()
    assert eids(db, "surname: %s", "Smith", in_vars=["?surname"]) == ["ivan"]
    assert eids(
        db,
        "surname: %s AND firstname: %s",
        "Smith",
        "Fred",
        in_vars=["?surname", "?firstname"],
    ) == ["ivan"]


def test_namespaced_keywords(spark):
    n = Node(spark, schema="id string, `person/surname` string")
    n.submit_tx([("put", {"id": "ivan", "person/surname": "Smith"})])
    n.await_tx()
    assert eids(n.db(), r"person\/surname: Smith") == ["ivan"]


def test_evict(spark):
    node = mknode(spark, [{"id": "ivan", "name": "Smith"}])
    assert eids(node.db(), "name: Smith") == ["ivan"]
    node.submit_tx([("evict", "ivan")])
    node.await_tx()
    assert eids(node.db(), "name: Smith") == []


def test_malformed_query(spark):
    node = mknode(spark, [{"id": "ivan", "name": "Smith"}])
    with pytest.raises(ValueError, match="Cannot parse"):
        eids(node.db(), "+12!")
    with pytest.raises(ValueError, match="Cannot parse"):
        eids(node.db(), "name:")
    with pytest.raises(ValueError, match="Cannot parse"):
        eids(node.db(), "AND name:Smith")
    with pytest.raises(ValueError, match="Cannot parse"):
        eids(node.db(), "(name:Smith")
    # r10 (advisor): a detached field followed by a fielded word must
    # raise, not silently drop the detached field
    with pytest.raises(ValueError, match="field with no term"):
        eids(node.db(), "firstname: foo:bar")


def test_use_in_argument(spark):
    node = mknode(
        spark, [{"id": "ivan", "firstname": "Fred", "surname": "Smith"}]
    )
    db = node.db()
    assert eids(db, "?s", "firstname: Fred", in_vars=["?s"]) == ["ivan"]
    # field-less terms search the (empty) default field — no matches
    assert eids(db, "?s", "firstname Fred", in_vars=["?s"]) == []
    assert eids(db, "?s", "firstname:James OR surname:smith",
                in_vars=["?s"]) == ["ivan"]
    with pytest.raises(ValueError,
                       match="lucene-text-search query must be String"):
        db.q(
            {"find": ["?e"], "in": ["?input"],
             "where": [[["lucene-text-search", "?input"], [["?e"]]]]},
            1,
        ).collect()


def test_construct_or_fields_dynamically(spark):
    node = mknode(
        spark, [{"id": "ivan", "firstname": "Fred", "surname": "Smith"}]
    )
    s = " OR ".join(f"{f}:Fre*" for f in ["firstname", "surname"])
    assert eids(node.db(), "?s", s, in_vars=["?s"]) == ["ivan"]


def test_scored_binding_and_case_insensitive_terms(spark):
    """[[?e ?score]] binds the relation's score column; terms are
    lowercased by the tokenizer on both sides, so surname:smith matches
    'Smith' (the analyzer-normalization the reference gets from
    Lucene's StandardAnalyzer)."""
    node = mknode(
        spark,
        [
            {"id": "a", "firstname": "Fred", "surname": "Smith"},
            {"id": "b", "firstname": "Maria", "surname": "Smith"},
        ],
    )
    res = node.db().q(
        {"find": ["?e", "?score"],
         "where": [[["lucene-text-search", "surname:smith"],
                    [["?e", "?score"]]]]}
    )
    got = {r.e: r.score for r in res.collect()}
    assert set(got) == {"a", "b"} and all(s > 0 for s in got.values())


def test_parser_precedence_and_parens(spark):
    """a OR b AND c parses as a OR (b AND c); parens override."""
    node = mknode(
        spark,
        [
            {"id": "x", "firstname": "Fred", "surname": "Jones"},
            {"id": "y", "firstname": "Anna", "surname": "Smith"},
            {"id": "z", "firstname": "Fred", "surname": "Smith"},
        ],
    )
    db = node.db()
    assert eids(db, "firstname:Anna OR firstname:Fred AND surname:Smith") == [
        "y", "z",
    ]
    assert eids(
        db, "(firstname:Anna OR firstname:Fred) AND surname:Smith"
    ) == ["y", "z"]
    assert eids(db, "surname:Smith NOT firstname:Anna") == ["z"]


# ---------------------------------------------------------------- parser
# property tests (no Spark): round-trip and total-failure behavior


def test_parser_roundtrip_property():
    """Random ASTs rendered fully parenthesized parse back to the same
    AST; random junk either parses or raises LuceneParseError — never
    any other exception."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crux_spark.functions.multi_field import (
        LuceneParseError,
        parse_query,
    )

    words = st.from_regex(r"[a-z][a-z0-9]{0,5}(\*|\?)?", fullmatch=True).filter(
        lambda w: w.rstrip("*?").upper() not in ("AND", "OR", "NOT") and w.rstrip("*?")
    )
    fields = st.one_of(st.none(), st.sampled_from(["a", "b", "person/surname"]))
    terms = st.tuples(st.just("term"), fields, words)

    def compose(children):
        return st.tuples(
            st.sampled_from(["and", "or", "not"]), children, children
        )

    asts = st.recursive(terms, compose, max_leaves=8)

    def render(node):
        kind = node[0]
        if kind == "term":
            _, f, w = node
            if f is None:
                return w
            return f.replace("/", "\\/") + ":" + w
        op = {"and": "AND", "or": "OR", "not": "NOT"}[kind]
        return f"({render(node[1])} {op} {render(node[2])})"

    @settings(max_examples=200, deadline=None)
    @given(asts)
    def roundtrip(ast):
        assert parse_query(render(ast)) == ast

    roundtrip()

    junk = st.text(
        alphabet="ab:()\\ *?!+ANDORT/", min_size=0, max_size=12
    )

    @settings(max_examples=300, deadline=None)
    @given(junk)
    def total(s):
        try:
            parse_query(s)
        except LuceneParseError:
            pass  # the only permitted failure mode

    total()


@pytest.mark.full
def test_evaluator_matches_python_model(spark):
    """Randomized evaluator check: random ASTs over a small corpus must
    score exactly like a pure-Python model of the same semantics
    (per-field tf-idf with per-(eid,value) 1e-6 rounding, wildcard
    clauses constant 1.0, OR=sum, AND=join+sum, NOT=anti)."""
    import math
    import random
    import re

    from crux_spark.functions.multi_field import evaluate
    from crux_spark.functions.text_search import build_av_text_index

    docs = [
        {"id": "d1", "a": "red fox fox", "b": "lazy dog"},
        {"id": "d2", "a": "red red wolf", "b": "red fox"},
        {"id": "d3", "a": "fort night", "b": None},
        {"id": "d4", "a": None, "b": "foxtrot red"},
        {"id": "d5", "a": "dog dog dog", "b": "night fox"},
    ]
    df = spark.createDataFrame(
        [(d["id"], d["a"], d["b"]) for d in docs],
        "eid string, a string, b string",
    )
    indexes = {
        f: build_av_text_index(df.select("eid", f), "eid", f)
        for f in ("a", "b")
    }

    def toks(s):
        return [t for t in re.sub(r"[^a-z0-9\s]", " ", (s or "").lower()).split() if t]

    n_docs = len(docs)

    def py_term(field, word):
        """-> {eid: score} per the engine's search_av + eid-sum."""
        vals = {d["id"]: d.get(field) for d in docs}
        out = {}
        if "*" in word or "?" in word:
            rx = re.compile(
                "^" + re.escape(word.lower()).replace(r"\*", ".*").replace(r"\?", ".") + "$"
            )
            for e, v in vals.items():
                if v is not None and any(rx.match(t) for t in toks(v)):
                    out[e] = 1.0
            return out
        w = word.lower()
        dfreq = sum(1 for v in vals.values() if v is not None and w in toks(v))
        for e, v in vals.items():
            if v is None:
                continue
            tf = toks(v).count(w)
            if tf:
                out[e] = round(tf * math.log(1 + n_docs / dfreq), 6)
        return out

    def py_eval(ast):
        k = ast[0]
        if k == "term":
            _, f, w = ast
            return py_term(f, w) if f in ("a", "b") else {}
        A, B = py_eval(ast[1]), py_eval(ast[2])
        if k == "or":
            return {e: A.get(e, 0) + B.get(e, 0) for e in set(A) | set(B)}
        if k == "and":
            return {e: A[e] + B[e] for e in set(A) & set(B)}
        return {e: s for e, s in A.items() if e not in B}

    rng = random.Random(29)
    words = ["red", "fox", "dog", "night", "wolf", "fo*", "f?x", "cat"]

    def rand_ast(depth):
        if depth == 0 or rng.random() < 0.4:
            return ("term", rng.choice(["a", "b"]), rng.choice(words))
        return (
            rng.choice(["and", "or", "not"]),
            rand_ast(depth - 1),
            rand_ast(depth - 1),
        )

    def index_for(field):
        return indexes.get(field)

    for _ in range(25):
        ast = rand_ast(3)
        got = {
            r.eid: r.score
            for r in evaluate(spark, ast, index_for).collect()
        }
        exp = {e: round(s, 6) for e, s in py_eval(ast).items()}
        assert got == exp, (ast, got, exp)
