"""Port of the reference's full-text-search corpus
(crux-lucene/test/crux/lucene_test.clj) onto the Datalog predicates
text-search / wildcard-text-search over Node snapshots.

Semantics checked: empty db, exact + wildcard (* / ?) term matching,
snapshot isolation of the index (before-db excludes later docs —
test-exclude-future-results; deleted docs drop out —
test-past-fuzzy-results-excluded), modification, eviction,
constant-1.0 wildcard scores, cardinality-many element binding,
across-attribute wildcard search with [e v a] binding, multiple
entities sharing an a/v pair (bug 1428), :in-bound search strings with
the must-be-String error, the open pred-constraint registry
(test-or-text-search), and >1000 results (results-not-limited-to-1000).

Scoring DIVERGENCE (documented): plain-term scores are tf-idf, not
Lucene BM25 bytes; wildcard clauses score constant 1.0 exactly like
Lucene's rewritten constant-score queries, which is what the
reference's Scores test pins.
"""

import pytest

from crux_spark.node import Node

SCHEMA = (
    "id string, name string, surname string, description string, "
    "foo array<string>"
)


def mknode(spark, docs):
    n = Node(spark, schema=SCHEMA)
    if docs:
        n.submit_tx([("put", d) for d in docs])
        n.await_tx()
    return n


def rows(df):
    return sorted(tuple(r) for r in df.collect())


TS = lambda q: {"find": ["?e"], "where": [[["text-search", ":name", q], [["?e"]]]]}


def test_empty_database_returns_empty(spark):
    node = mknode(spark, [])
    assert rows(node.db().q(TS("Ivan"))) == []


@pytest.mark.full
def test_can_search_string(spark):
    node = mknode(spark, [{"id": "ivan", "name": "Ivan"}])
    db = node.db()
    assert rows(db.q(TS("Ivan"))) == [("ivan",)]

    # bad spec: attribute must be a keyword
    with pytest.raises(Exception):
        db.q({"find": ["?e"], "where": [[["text-search", "Wot", "Ivan"], [["?e"]]]]})

    # fuzzy / wildcard terms
    assert rows(db.q(TS("Iv*"))) == [("ivan",)]

    # subsequent tx/doc: the earlier db value excludes the new doc
    before_db = node.db()
    node.submit_tx([("put", {"id": "ivan2", "name": "Ivbn"})])
    node.await_tx()
    assert rows(before_db.q(TS("Iv?n"))) == [("ivan",)]
    assert rows(node.db().q(TS("Iv?n"))) == [("ivan",), ("ivan2",)]

    # modifying a doc: old text stops matching, new text starts
    before_db = node.db()
    node.submit_tx([("put", {"id": "ivan", "name": "Derek"})])
    node.await_tx()
    assert rows(before_db.q(TS("Derek"))) == []
    assert rows(node.db().q(TS("Derek"))) == [("ivan",)]

    # eviction removes the entity from the index
    node.submit_tx([("put", {"id": "ivan2", "name": "Derek"})])
    node.await_tx()
    node.submit_tx([("evict", "ivan")])
    node.await_tx()
    assert rows(node.db().q(TS("Ivan"))) == []
    assert rows(node.db().q(TS("Derek"))) == [("ivan2",)]


def test_scores_constant_for_wildcard(spark):
    node = mknode(
        spark,
        [{"id": "test0", "name": "ivon"},
         {"id": "test1", "name": "ivan"},
         {"id": "test2", "name": "testivantest"},
         {"id": "test3", "name": "testing"},
         {"id": "test4", "name": "ivanpost"}],
    )
    res = node.db().q(
        {"find": ["?e", "?v", "?score"],
         "where": [[["text-search", ":name", "ivan*"], [["?e", "?v", "?score"]]]]}
    )
    assert rows(res) == [("test1", "ivan", 1.0), ("test4", "ivanpost", 1.0)]


def test_cardinality_many(spark):
    node = mknode(spark, [{"id": "ivan", "foo": ["atar", "abar", "nomatch"]}])
    db = node.db()
    res = db.q({"find": ["?e", "?v"],
                "where": [[["text-search", ":foo", "atar"], [["?e", "?v"]]]]})
    assert rows(res) == [("ivan", "atar")]
    res = db.q({"find": ["?e", "?v"],
                "where": [[["text-search", ":foo", "a?ar"], [["?e", "?v"]]]]})
    assert rows(res) == [("ivan", "abar"), ("ivan", "atar")]


def test_search_across_attributes(spark):
    node = mknode(spark, [{"id": "ivan", "name": "Ivan"}])
    db = node.db()
    res = db.q({"find": ["?e", "?v", "?a"],
                "where": [[["wildcard-text-search", "Ivan"], [["?e", "?v", "?a"]]]]})
    assert rows(res) == [("ivan", "Ivan", ":name")]

    # no match against a non-existent field -> empty, not an error
    res = db.q({"find": ["?e", "?v"],
                "where": [[["text-search", ":non-field", "Ivan"], [["?e", "?v"]]]]})
    assert rows(res) == []

    # multiple a/v matches for one entity (4th slot = score blank)
    node.submit_tx([("put", {"id": "ivan", "name": "Ivan", "surname": "Ivan"})])
    node.await_tx()
    res = node.db().q(
        {"find": ["?e", "?v", "?a"],
         "where": [[["wildcard-text-search", "Ivan"], [["?e", "?v", "?a", "_"]]]]}
    )
    assert rows(res) == [("ivan", "Ivan", ":name"), ("ivan", "Ivan", ":surname")]


def test_multiple_entities_same_av_pair_1428(spark):
    node = mknode(
        spark,
        [{"id": "ivan1", "name": "Ivan"},
         {"id": "ivan2", "name": "Ivan"},
         {"id": "ivan3", "name": "Ivan1"}],
    )
    db = node.db()
    assert rows(db.q(TS("Iv*"))) == [("ivan1",), ("ivan2",), ("ivan3",)]
    res = db.q({"find": ["?e"],
                "where": [[["wildcard-text-search", "Iv*"], [["?e"]]]]})
    assert rows(res) == [("ivan1",), ("ivan2",), ("ivan3",)]


def test_past_fuzzy_results_excluded(spark):
    node = mknode(spark, [{"id": "ivan0", "name": "Ivan"}])
    node.submit_tx([("delete", "ivan0")])
    node.await_tx()
    node.submit_tx([("put", {"id": "ivan1", "name": "Ivana"})])
    node.await_tx()
    assert rows(node.db().q(TS("Ivan*"))) == [("ivan1",)]


def test_exclude_future_results(spark):
    node = mknode(spark, [{"id": "ivan", "name": "Ivanka"}])
    before_db = node.db()
    node.submit_tx([("put", {"id": "ivan", "name": "Ivan"})])
    node.await_tx()
    assert rows(before_db.q(TS("Ivan"))) == []
    assert rows(node.db().q(TS("Ivan"))) == [("ivan",)]


def test_structural_sharing_scores_stable(spark):
    node = mknode(spark, [{"id": "ivan", "name": "Ivan"}])
    q = {"find": ["?e", "?v", "?s"],
         "where": [[["text-search", ":name", "Ivan"], [["?e", "?v", "?s"]]]]}
    prior = rows(node.db().q(q))
    node.submit_tx([("put", {"id": "ivan", "name": "Ivan"})])
    node.await_tx()
    node.submit_tx([("put", {"id": "ivan", "name": "Ivan"})])
    node.await_tx()
    assert rows(node.db().q(q)) == prior


def test_use_in_argument(spark):
    node = mknode(
        spark, [{"id": "ivan", "name": "Fred", "surname": "Smith"}]
    )
    db = node.db()
    res = db.q({"find": ["?e"], "in": ["?s"],
                "where": [[["wildcard-text-search", "?s"], [["?e"]]]]}, "Fre*")
    assert rows(res) == [("ivan",)]
    with pytest.raises(ValueError, match="Lucene text search values must be String"):
        db.q({"find": ["?v"], "in": ["?input"],
              "where": [[["wildcard-text-search", "?input"], [["?e", "?v"]]]]}, 1)


def test_or_text_search_custom_constraint(spark):
    """The open pred-constraint registry (query.clj:269-273): register
    or-text-search exactly like the reference's defmethod
    (lucene_test.clj:341-357)."""
    from functools import reduce

    from crux_spark.datalog.compile import (
        PRED_CONSTRAINTS,
        register_pred_constraint,
    )

    def or_text_search(compiler, df, form, binding):
        attr, queries = form[1], form[2]
        parts = [
            compiler._text_search_pred(
                df, "text-search", ["text-search", attr, q], binding
            )
            for q in sorted(queries)
        ]
        return reduce(lambda a, b: a.unionByName(b), parts).distinct()

    register_pred_constraint("or-text-search", or_text_search)
    try:
        node = mknode(
            spark,
            [{"id": "ivan", "name": "Ivan"},
             {"id": "fred", "name": "Fred"},
             {"id": "matt", "name": "Matt"}],
        )
        db = node.db()
        res = db.q({"find": ["?e"],
                    "where": [[["or-text-search", ":name", {"Ivan"}], [["?e", "?v"]]]]})
        assert sorted(r.e for r in res.collect()) == ["ivan"]
        res = db.q({"find": ["?e"],
                    "where": [[["or-text-search", ":name", {"Ivan", "Fred"}], [["?e", "?v"]]]]})
        assert sorted(r.e for r in res.collect()) == ["fred", "ivan"]
    finally:
        PRED_CONSTRAINTS.pop("or-text-search", None)


def test_results_not_limited_to_1000(spark):
    node = mknode(
        spark,
        [{"id": str(n), "description": f"Entity {n}"} for n in range(1001)],
    )
    res = node.db().q(
        {"find": ["?e"],
         "where": [[["text-search", ":description", "Entity*"], [["?e"]]]]}
    )
    assert res.count() == 1001
