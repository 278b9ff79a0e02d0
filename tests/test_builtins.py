"""Scalar builtin registry: each fn checked against expected values
through the full Datalog pipeline (§2.8 parity table)."""

import pytest
from pyspark.sql import types as T

from crux_spark import Catalog
from crux_spark.datalog import q


@pytest.fixture(scope="module")
def cat(spark):
    c = Catalog(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("s", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("arr", T.ArrayType(T.LongType())),
        ]
    )
    c.add_documents(
        "vals",
        spark.createDataFrame([("e", "  Hello World  ", 7, 2.5, [30, 10, 20])], schema),
        id_col="id",
    )
    return c


CASES = [
    (["+", "?n", 3], 10),
    (["-", "?n", 1, 2], 4),
    (["*", "?n", 2], 14),
    (["quot", "?n", 2], 3),
    (["mod", -7, 3], 2),
    (["rem", "?n", 3], 1),
    (["inc", "?n"], 8),
    (["dec", "?n"], 6),
    (["abs", ["-", 0, "?n"]], 7),
    (["min", "?n", 3, 5], 3),
    (["max", "?n", 3, 5], 7),
    (["ceil", "?x"], 3),
    (["floor", "?x"], 2),
    (["round", "?x"], 3.0),
    (["truncate", "?x", 0], 2.0),
    (["long", "?x"], 2),
    (["double", "?n"], 7.0),
    (["str", "?n", "!"], "7!"),
    (["subs", "Hello", 1, 3], "el"),
    (["subs", "Hello", 3], "lo"),
    (["substring", "Hello", 2, 3], "ell"),
    (["count", "Hello"], 5),
    (["char_length", "Hello"], 5),
    (["lower-case", "AbC"], "abc"),
    (["upper-case", "AbC"], "ABC"),
    (["initcap", "hello world"], "Hello World"),
    (["trim", "?s"], "Hello World"),
    (["ltrim", "?s"], "Hello World  "),
    (["rtrim", "?s"], "  Hello World"),
    (["replace", "Hello", "l", "L"], "HeLLo"),
    (["concat", "a", "b", "c"], "abc"),
    (["name", ":foo/bar"], "bar"),
    (["namespace", ":foo/bar"], "foo"),
    (["keyword", "kw"], ":kw"),
    (["first", ["vector", 30, 10, 20]], 30),
    (["last", ["vector", 30, 10, 20]], 20),
    (["nth", ["vector", 30, 10, 20], 1], 10),
    (["size", ["vector", 30, 10, 20]], 3),
    (["sort", ["vector", 30, 10, 20]], [10, 20, 30]),
    (["reverse", ["vector", 30, 10, 20]], [20, 10, 30]),
    (["set", ["vector", 30, 10, 20]], [30, 10, 20]),
    (["range", 3], [0, 1, 2]),
    (["range", 2, 5], [2, 3, 4]),
    (["take", 2, ["vector", 30, 10, 20]], [30, 10]),
    (["conj", ["vector", 30, 10, 20], 99], [30, 10, 20, 99]),
    (["identity", "?n"], 7),
    # --- allowlist tier 2 (query-allowlist.edn breadth pass) ---
    (["zero?", ["-", "?n", 7]], True),
    (["pos?", "?n"], True),
    (["neg?", ["-", 0, "?n"]], True),
    (["int?", "?n"], True),
    (["int?", "?x"], False),
    (["integer?", 5], True),
    (["pos-int?", "?n"], True),
    (["neg-int?", "?n"], False),
    (["nat-int?", 0], True),
    (["double?", "?x"], True),
    (["double?", "?n"], False),
    (["float?", 2.5], True),
    (["boolean?", "?n"], False),
    (["true?", True], True),
    (["true?", 1], False),
    (["false?", False], True),
    (["any?", "?n"], True),
    (["inst?", "?n"], False),
    (["compare", 3, 7], -1),
    (["compare", 7, 3], 1),
    (["compare", "?n", 7], 0),
    (["bit-and", 12, 10], 8),
    (["bit-or", 12, 10], 14),
    (["bit-xor", 12, 10], 6),
    (["bit-not", 0], -1),
    (["bit-and-not", 12, 10], 4),
    (["bit-shift-left", 1, 4], 16),
    (["bit-shift-right", 16, 2], 4),
    (["unsigned-bit-shift-right", 16, 2], 4),
    (["bit-test", 5, 2], True),
    (["bit-test", 5, 1], False),
    (["bit-set", 4, 0], 5),
    (["bit-clear", 5, 0], 4),
    (["bit-flip", 4, 0], 5),
    (["format", "%s-%d", "a", "?n"], "a-7"),
    (["re-seq", "[0-9]+", "a1b22c333"], ["1", "22", "333"]),
    (["re-find", ["re-pattern", "^He"], "Hello"], True),
    (["capitalize", "hELLO"], "Hello"),
    (["join", ",", ["vector", 30, 10]], "30,10"),
    (["split", "a,b,c", ","], ["a", "b", "c"]),
    (["index-of", "Hello", "ll"], 2),
    (["last-index-of", "abab", "ab"], 2),
    (["blank?", "  "], True),
    (["blank?", "?s"], False),
    (["like", "Hello", "H%o"], True),
    (["char", 65], "A"),
    (["second", ["vector", 30, 10, 20]], 10),
    (["ffirst", ["vector", ["vector", 5, 6]]], 5),
    (["rest", ["vector", 30, 10, 20]], [10, 20]),
    (["next", ["vector", 30]], None),
    (["butlast", ["vector", 30, 10, 20]], [30, 10]),
    (["drop", 1, ["vector", 30, 10, 20]], [10, 20]),
    (["drop-last", ["vector", 30, 10, 20]], [30, 10]),
    (["drop-last", 2, ["vector", 30, 10, 20]], [30]),
    (["take-last", 2, ["vector", 30, 10, 20]], [10, 20]),
    (["take-nth", 2, ["vector", 1, 2, 3, 4, 5]], [1, 3, 5]),
    (["distinct", ["vector", 1, 2, 1, 3]], [1, 2, 3]),
    (["dedupe", ["vector", 1, 1, 2, 2, 1]], [1, 2, 1]),
    (["distinct?", ["vector", 1, 2, 3]], True),
    (["distinct?", ["vector", 1, 2, 1]], False),
    (["empty?", ["rest", ["vector", 1]]], True),
    (["empty?", "?s"], False),
    (["not-empty", ["vector", 1]], [1]),
    (["flatten", ["vector", ["vector", 1, 2], ["vector", 3]]], [1, 2, 3]),
    (["interpose", 0, ["vector", 1, 2, 3]], [1, 0, 2, 0, 3]),
    (["interleave", ["vector", 1, 3], ["vector", 2, 4]], [1, 2, 3, 4]),
    (["cons", 0, ["vector", 1, 2]], [0, 1, 2]),
    (["peek", ["vector", 1, 2, 3]], 3),
    (["pop", ["vector", 1, 2, 3]], [1, 2]),
    (["subvec", ["vector", 10, 20, 30, 40], 1, 3], [20, 30]),
    (["subvec", ["vector", 10, 20, 30, 40], 2], [30, 40]),
    (["split-at", 2, ["vector", 1, 2, 3, 4]], [[1, 2], [3, 4]]),
    (["partition", 2, ["vector", 1, 2, 3, 4, 5]], [[1, 2], [3, 4]]),
    (["partition-all", 2, ["vector", 1, 2, 3, 4, 5]], [[1, 2], [3, 4], [5]]),
    (["repeat", 3, "ab"], ["ab", "ab", "ab"]),
    (["frequencies", ["vector", 1, 2, 1, 1]], {1: 3, 2: 1}),
    (["zipmap", ["vector", 1, 2], ["vector", 10, 20, 30]], {1: 10, 2: 20}),
    (["keys", ["zipmap", ["vector", 1, 2], ["vector", 10, 20]]], [1, 2]),
    (["vals", ["zipmap", ["vector", 1, 2], ["vector", 10, 20]]], [10, 20]),
    (
        ["merge", ["zipmap", ["vector", 1], ["vector", 10]],
         ["zipmap", ["vector", 1, 2], ["vector", 99, 20]]],
        {1: 99, 2: 20},
    ),
    (
        ["select-keys", ["zipmap", ["vector", 1, 2, 3], ["vector", 10, 20, 30]], [1, 3]],
        {1: 10, 3: 30},
    ),
    (
        ["dissoc", ["zipmap", ["vector", 1, 2], ["vector", 10, 20]], 1],
        {2: 20},
    ),
    (
        ["assoc", ["zipmap", ["vector", 1], ["vector", 10]], 2, 20],
        {1: 10, 2: 20},
    ),
    (["get-in", ["zipmap", ["vector", 1, 2], ["vector", 10, 20]], [2]], 20),
    (["get", ["zipmap", ["vector", 1, 2], ["vector", 10, 20]], 1], 10),
    (["contains?", ["zipmap", ["vector", 1, 2], ["vector", 10, 20]], 99], False),
    (["contains?", ["zipmap", ["vector", 1, 2], ["vector", 10, 20]], 2], True),
    # --- allowlist tier 3 (the rest of query-allowlist.edn) ---
    (["coll?", ["vector", 1]], True),
    (["coll?", "?n"], False),
    (["map?", ["zipmap", ["vector", 1], ["vector", 10]]], True),
    (["map?", "?s"], False),
    (["vector?", ["vector", 1]], True),
    (["seq?", ["vector", 1]], True),
    (["sequential?", ["vector", 1]], True),
    (["seqable?", "?s"], True),
    (["associative?", ["vector", 1]], True),
    (["indexed?", ["vector", 1]], True),
    (["counted?", ["vector", 1]], True),
    (["reversible?", ["vector", 1]], True),
    (["set?", "?n"], False),
    (["sorted?", "?n"], False),
    (["char?", ["subs", "Hello", 0, 1]], True),
    (["char?", "Hello"], False),
    (["decimal?", ["bigdec", "?n"]], True),
    (["rational?", "?n"], True),
    (["rational?", "?x"], False),
    (["ratio?", "?n"], False),
    (["keyword?", ":foo"], True),
    (["keyword?", "foo"], False),
    (["symbol?", "?s"], False),
    (["ident?", ":foo"], True),
    (["simple-keyword?", ":foo"], True),
    (["simple-keyword?", ":foo/bar"], False),
    (["qualified-keyword?", ":foo/bar"], True),
    (["uuid?", "123e4567-e89b-12d3-a456-426614174000"], True),
    (["uuid?", "?s"], False),
    (["uri?", "https://example.com/x"], True),
    (["uri?", "?s"], False),
    (["record?", "?n"], False),
    (["identical?", "?n", 7], True),
    (["type", "?n"], "bigint"),
    (["fnext", ["vector", 30, 10, 20]], 10),
    (["nfirst", ["vector", ["vector", 5, 6], ["vector", 7]]], [6]),
    (["nnext", ["vector", 1, 2, 3, 4]], [3, 4]),
    (["nnext", ["vector", 1, 2]], None),
    (["nthnext", ["vector", 1, 2, 3], 1], [2, 3]),
    (["nthnext", ["vector", 1, 2, 3], 5], None),
    (["nthrest", ["vector", 1, 2, 3], 5], []),
    (["rseq", ["vector", 1, 2, 3]], [3, 2, 1]),
    (["seq", ["vector", 1]], [1]),
    (["seq", ["rest", ["vector", 1]]], None),
    (["empty", ["vector", 1, 2]], []),
    (["find", ["zipmap", ["vector", 1, 2], ["vector", 10, 20]], 2], ["2", "20"]),
    (["find", ["zipmap", ["vector", 1], ["vector", 10]], 9], None),
    (["list", 1, 2, 3], [1, 2, 3]),
    (["list*", 0, ["vector", 1, 2]], [0, 1, 2]),
    (["hash-map", 1, 10, 2, 20], {1: 10, 2: 20}),
    (["array-map", 1, 10], {1: 10}),
    (["hash-set", 3, 1, 3], [3, 1]),
    (["sorted-set", 3, 1, 3], [1, 3]),
    (["disj", ["sorted-set", 1, 2, 3], 2], [1, 3]),
    (["vector-of", ":int", 1, 2], [1, 2]),
    (["num", "?n"], 7),
    (["bigint", "?x"], 2),
    (["short", "?n"], 7),
    (["byte", "?n"], 7),
    (["float", "?n"], 7.0),
    (["rationalize", "?x"], 2.5),
    (["doubles", ["vector", 1, 2]], [1.0, 2.0]),
    (["longs", ["vector", 1, 2]], [1, 2]),
    (["chars", "abc"], ["a", "b", "c"]),
    (["aget", ["vector", 10, 20], 1], 20),
    (["alength", ["vector", 10, 20]], 2),
    (["transient", ["vector", 1]], [1]),
    (["persistent!", ["transient", ["vector", 1]]], [1]),
    (["conj!", ["vector", 1], 2], [1, 2]),
    (["subseq", ["sorted-set", 1, 5, 9], "<", 6], [1, 5]),
    (["subseq", ["sorted-set", 1, 5, 9], ">=", 5], [5, 9]),
    (["rsubseq", ["sorted-set", 1, 5, 9], "<", 6], [5, 1]),
    (["ns-name", ":foo/bar"], "foo"),
    (["re-groups", ["re-matcher", "[0-9]+", "ab123cd"]], "123"),
]


@pytest.mark.parametrize("form,expected", CASES, ids=[str(c[0][0]) + str(i) for i, c in enumerate(CASES)])
def test_builtin(cat, form, expected):
    res = q(
        cat,
        {
            "find": ["?out"],
            "where": [
                ["?e", ":n", "?n"],
                ["?e", ":x", "?x"],
                ["?e", ":s", "?s"],
                [form, "?out"],
            ],
        },
    )
    # note: ?arr is array-typed; bind it via a dedicated query when needed
    got = [r.out for r in res.collect()]
    assert len(got) == 1
    if isinstance(expected, float):
        assert abs(got[0] - expected) < 1e-9
    else:
        assert got[0] == expected


def test_equality_folding_respects_unknown_expr_dtypes(spark):
    """Regression: _dtype_of used to guess 'array' for any unenumerated
    expression head; cross-type equality folding then turned
    [(= (year ?d) 2024)] into lit(False) and [(not= (bit-and ?n 4) 0)]
    into lit(True) — silently wrong results."""
    import datetime as dt

    c = Catalog(spark)
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("d", T.TimestampType()),
            T.StructField("n", T.LongType()),
        ]
    )
    c.add_documents(
        "tvals",
        spark.createDataFrame(
            [
                ("a", dt.datetime(2024, 3, 15), 5),
                ("b", dt.datetime(2023, 7, 1), 4),
            ],
            schema,
        ),
        id_col="id",
    )
    # numeric-returning date part compared to an int literal: must filter,
    # not constant-fold
    res = q(
        c,
        {
            "find": ["?e"],
            "where": [
                ["?e", ":d", "?d"],
                [["=", ["year", "?d"], 2024]],
            ],
        },
    )
    assert [r.e for r in res.collect()] == ["a"]
    # bit ops return numbers: (bit-and 5 4) = 4 != 0 -> row a survives
    res2 = q(
        c,
        {
            "find": ["?e"],
            "where": [
                ["?e", ":n", "?n"],
                [["not=", ["bit-and", "?n", 4], 0]],
            ],
        },
    )
    assert sorted(r.e for r in res2.collect()) == ["a", "b"]
    # boolean-returning head vs boolean literal
    res3 = q(
        c,
        {
            "find": ["?e"],
            "where": [
                ["?e", ":n", "?n"],
                [["=", ["even?", "?n"], True]],
            ],
        },
    )
    assert [r.e for r in res3.collect()] == ["b"]
    # timestamp-returning head vs timestamp literal
    res4 = q(
        c,
        {
            "find": ["?e"],
            "where": [
                ["?e", ":d", "?d"],
                [["=", ["date-trunc", "year", "?d"], dt.datetime(2024, 1, 1)]],
            ],
        },
    )
    assert [r.e for r in res4.collect()] == ["a"]


def test_boolean_and_predicates(cat):
    res = q(
        cat,
        {
            "find": ["?n"],
            "where": [
                ["?e", ":n", "?n"],
                [["and", [">", "?n", 5], ["<", "?n", 10]]],
                [["or", ["evenp", "?n"], ["oddp", "?n"]]],
                [["not", ["nil?", "?n"]]],
                [["some?", "?n"]],
                [["starts-with?", "Hello", "He"]],
                [["ends-with?", "Hello", "lo"]],
                [["includes?", "Hello", "ell"]],
                [["re-matches", "H.*o", "Hello"]],
            ],
        },
    )
    assert [r.n for r in res.collect()] == [7]


def test_string_preds_with_variable_needle(cat, spark):
    """starts-with?/ends-with?/includes? with a VARIABLE second arg: the
    needle must resolve to the bound column, not the literal "?v" text
    (r13 regression — found via SPARQL CONTAINS(?fn, ?g) returning
    empty across two scan groups)."""
    from crux_spark.catalog import Catalog

    c = Catalog(spark)
    c.add_documents(
        "strs",
        spark.createDataFrame(
            [("a", "Hello world", "Hello"), ("b", "Hello world", "nope"),
             ("c", "say Hello", "Hello")],
            ["id", "hay", "needle"],
        ),
        id_col="id",
    )
    got = {r.e for r in q(c, {
        "find": ["?e"],
        "where": [["?e", ":hay", "?h"], ["?e", ":needle", "?n"],
                  [["includes?", "?h", "?n"]]],
    }).collect()}
    assert got == {"a", "c"}
    got2 = {r.e for r in q(c, {
        "find": ["?e"],
        "where": [["?e", ":hay", "?h"], ["?e", ":needle", "?n"],
                  [["starts-with?", "?h", "?n"]]],
    }).collect()}
    assert got2 == {"a"}
    got3 = {r.e for r in q(c, {
        "find": ["?e"],
        "where": [["?e", ":hay", "?h"], ["?e", ":needle", "?n"],
                  [["ends-with?", "?h", "?n"]]],
    }).collect()}
    assert got3 == {"c"}


def test_subs_subvec_variable_bounds_and_in_bound_regex(cat, spark):
    """(subs ?s 0 ?n) / (subvec ?v 1 ?k) with VARIABLE bounds, and
    re-find with an :in-bound pattern string (r13: positions and
    patterns resolve through build()/env like any operand)."""
    from crux_spark.catalog import Catalog

    c = Catalog(spark)
    c.add_documents(
        "rows",
        spark.createDataFrame(
            [("a", "abcdef", 3, 2), ("b", "hello", 2, 1)],
            ["id", "s", "n", "k"],
        ),
        id_col="id",
    )
    got = {(r.e, r.pre) for r in q(c, {
        "find": ["?e", "?pre"],
        "where": [["?e", ":s", "?s"], ["?e", ":n", "?n"],
                  [["subs", "?s", 0, "?n"], "?pre"]],
    }).collect()}
    assert got == {("a", "abc"), ("b", "he")}
    # subvec with a variable end over a computed array (array-valued doc
    # attributes explode to cardinality-many in the EAV view, so build
    # the vector in-query)
    got2 = {(r.e, tuple(r.head)) for r in q(c, {
        "find": ["?e", "?head"],
        "where": [["?e", ":s", "?s"], ["?e", ":k", "?k"],
                  [["vector", "?s", "?s", "?s"], "?v3"],
                  [["subvec", "?v3", 0, "?k"], "?head"]],
    }).collect()}
    assert got2 == {("a", ("abcdef", "abcdef")), ("b", ("hello",))}
    got3 = {r.e for r in q(c, {
        "find": ["?e"],
        "in": ["?pat"],
        "where": [["?e", ":s", "?s"], [["re-find", "?pat", "?s"]]],
    }, "^ab").collect()}
    assert got3 == {"a"}
