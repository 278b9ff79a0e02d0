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
