"""Port of query_fn_allowlist_test.clj: disallowed predicate heads are
rejected with the reference's error; registering a name (the
:fn-allow-list analogue) makes it callable — as a JVM Column expression
(preferred) or a plain Python callable (row-UDF escape hatch)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crux_spark import Catalog
from crux_spark.datalog import q
from crux_spark.datalog.builtins import register_query_fn, unregister_query_fn


@pytest.fixture(scope="module")
def ages(spark):
    cat = Catalog(spark)
    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("age", T.LongType())]
    )
    cat.add_documents(
        "people",
        spark.createDataFrame([("a", 21), ("b", 22), ("c", 35)], schema),
        id_col="id",
    )
    return cat


def _ages(cat, pred):
    return sorted(
        r.age
        for r in q(
            cat, {"find": ["?age"], "where": [["?e", ":age", "?age"], [pred]]}
        ).collect()
    )


def test_default_allowlist_functions_work(ages):
    assert _ages(ages, ["odd?", "?age"]) == [21, 35]


def test_disallowed_function_raises(ages):
    # the reference: "Query used a function that was not in the allowlist"
    with pytest.raises(Exception, match="not in the allowlist"):
        _ages(ages, ["spit", "crux.txt", "?age"])
    with pytest.raises(Exception, match="not in the allowlist"):
        _ages(ages, ["multiple-of-three?", "?age"])


def test_registered_fn_columnar(ages):
    register_query_fn(
        "multiple-of-seven?", lambda c: c % 7 == 0, columnar=True
    )
    try:
        assert _ages(ages, ["multiple-of-seven?", "?age"]) == [21, 35]
        # others remain unregistered
        with pytest.raises(Exception, match="not in the allowlist"):
            _ages(ages, ["multiple-of-three?", "?age"])
    finally:
        unregister_query_fn("multiple-of-seven?")


def test_registered_fn_python_udf(ages):
    register_query_fn("multiple-of-three?", lambda n: n is not None and n % 3 == 0)
    try:
        assert _ages(ages, ["multiple-of-three?", "?age"]) == [21]
    finally:
        unregister_query_fn("multiple-of-three?")
    with pytest.raises(Exception, match="not in the allowlist"):
        _ages(ages, ["multiple-of-three?", "?age"])
