"""crux_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of juxt/crux (XTDB 1.x).

Not a port: the reference's unbundled tx-log / doc-store / KV-index
architecture (SURVEY.md §0) collapses into immutable columnar tables, and
its n-ary leapfrog Datalog join engine (crux-core/src/crux/query.clj)
collapses into a Datalog -> DataFrame compiler that lets Catalyst pick join
order, pushdown, and shuffle strategy.

Public surface:
    from crux_spark import get_spark, Catalog, q
"""

from crux_spark.session import get_spark
from crux_spark.catalog import Catalog
from crux_spark.datalog import q
import crux_spark.functions  # noqa: F401 — registers lucene-text-search

__all__ = ["get_spark", "Catalog", "q"]
__version__ = "0.1.0"
