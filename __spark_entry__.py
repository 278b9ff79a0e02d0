"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 pricing summary,
expressed in the engine's Datalog surface and compiled to a Catalyst plan)
on sf0.001. ``queries()`` / ``oracle_sql()`` enumerate the implemented
operator inventory per SURVEY.md §2 with DuckDB-checkable oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crux_spark import Catalog
from crux_spark.datalog import q
import crux_spark.queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1 via the Datalog -> DataFrame compiler."""
    catalog = Catalog(spark, "/root/testdata/sf0.001")
    return q(
        catalog,
        {
            "find": [
                "?flag",
                "?status",
                ["sum", "?qty", "sum_qty"],
                ["sum", "?price", "sum_base_price"],
                ["sum", "?disc_price", "sum_disc_price"],
                ["sum", "?charge", "sum_charge"],
                ["avg", "?qty", "avg_qty"],
                ["count", "?qty", "count_order"],
            ],
            "where": [
                ["?l", ":l_returnflag", "?flag"],
                ["?l", ":l_linestatus", "?status"],
                ["?l", ":l_quantity", "?qty"],
                ["?l", ":l_extendedprice", "?price"],
                ["?l", ":l_discount", "?d"],
                ["?l", ":l_tax", "?t"],
                ["?l", ":l_shipdate", "?sd"],
                [["<=", "?sd", "1998-09-02"]],
                [["*", "?price", ["-", 1, "?d"]], "?disc_price"],
                [["*", ["*", "?price", ["-", 1, "?d"]], ["+", 1, "?t"]], "?charge"],
            ],
            "order-by": [["?flag", "asc"], ["?status", "asc"]],
        },
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return Q.QUERIES


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry."""
    return Q.ORACLES
