"""Attribute catalog: maps Datalog attributes to columnar tables.

The reference stores every document decomposed into (A,V,E) triples in four
KV content indexes (crux-core/src/crux/kv/index_store.clj:936-963). The
Spark-first equivalent keeps documents as *typed columnar tables* — one
table per entity shape — and resolves a triple pattern ``[?e :attr ?v]`` to
``table.select(_id AS ?e, attr AS ?v)``. Catalyst then gets full predicate
pushdown + column pruning on the parquet scan, which the exploded-EAV layout
would forfeit for typed attributes.

Schemaless/heterogeneous collections register the same way via
:meth:`Catalog.add_documents` (any DataFrame + id column); cardinality-many
attributes are array columns and explode at pattern-resolution time
(codec.clj:822-828 ``multiple-values?`` equivalent).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Primary keys for the driver-generated testdata tables (FIXTURES.md §1);
# `_id` is the concatenation of pkey values — the analogue of the
# reference's content-addressed entity id (crux-core/src/crux/codec.clj:526-608),
# but using the natural key so it stays human-readable and join-friendly.
PKEYS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

ID_COL = "_id"


@dataclass
class AttrRef:
    table: str
    column: str
    is_array: bool


class Catalog:
    """Resolves attributes → tables for the Datalog compiler.

    Parameters
    ----------
    spark : SparkSession
    sf_dir : path containing ``<table>.parquet`` files (TESTDATA.md), or
        None to start empty and register collections manually.
    """

    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        self.spark = spark
        self.sf_dir = sf_dir
        self._dfs: dict[str, DataFrame] = {}
        self._attrs: dict[str, AttrRef] = {}
        self._table_attrs: dict[str, list[str]] = {}
        if sf_dir:
            for name in PKEYS:
                path = os.path.join(sf_dir, f"{name}.parquet")
                if os.path.exists(path):
                    self._register_lazy(name, path, PKEYS[name])

    # -- registration -----------------------------------------------------

    def _register_lazy(self, name: str, path: str, pkey: list[str]) -> None:
        df = self.spark.read.parquet(path)
        # TIMESTAMP(NANOS) parquet columns arrive as long (nanosAsLong);
        # normalize to Spark's native microsecond timestamps.
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        self._register_df(name, df, pkey)

    def _register_df(self, name: str, df: DataFrame, pkey: list[str]) -> None:
        if pkey and ID_COL not in df.columns:
            # Catalyst prunes _id when unused, so the concat costs nothing
            # on queries that never bind the entity var.
            df = df.withColumn(
                ID_COL, F.concat_ws("_", *[F.col(c).cast("string") for c in pkey])
            )
        self._dfs[name] = df
        self._table_attrs[name] = []
        for field in df.schema.fields:
            if field.name == ID_COL:
                continue
            attr = f":{field.name}"
            self._attrs[attr] = AttrRef(
                table=name,
                column=field.name,
                is_array=isinstance(field.dataType, T.ArrayType),
            )
            self._table_attrs[name].append(attr)

    def add_documents(
        self, name: str, df: DataFrame, id_col: str | None = None, prefix: str = ""
    ) -> None:
        """Register a schemaless document collection (wide DataFrame; missing
        attributes are nulls, cardinality-many attributes are arrays)."""
        if id_col and id_col != ID_COL:
            df = df.withColumn(ID_COL, F.col(id_col).cast("string"))
            pkey = []
        else:
            pkey = [c for c in df.columns if c == ID_COL] and [] or []
        self._register_df(name, df, pkey)
        if prefix:
            # re-key attrs under the prefix, e.g. ":person/name"
            for attr in list(self._table_attrs[name]):
                ref = self._attrs.pop(attr)
                new = f":{prefix}{attr[1:]}"
                self._attrs[new] = ref
            self._table_attrs[name] = [f":{prefix}{a[1:]}" for a in self._table_attrs[name]]

    # -- lookup -----------------------------------------------------------

    def table(self, name: str) -> DataFrame:
        return self._dfs[name]

    def tables(self) -> list[str]:
        return list(self._dfs)

    def resolve_attr(self, attr: str) -> AttrRef:
        try:
            return self._attrs[attr]
        except KeyError:
            raise KeyError(
                f"unknown attribute {attr!r}; known: {sorted(self._attrs)[:20]}..."
            ) from None

    def eav_view(self) -> DataFrame:
        """Union of the typed EAV triples views of every registered table
        (SURVEY.md §1.5's `triples` view) — the fallback scan for
        variable-attribute Datalog patterns ``[?e ?a ?v]``. Values bind in
        stringified form; typed comparisons should use fixed attributes."""
        if getattr(self, "_eav", None) is None:
            from crux_spark.sources.loaders import triples_view

            views = [triples_view(self._dfs[t]) for t in self._dfs]
            out = views[0]
            for v in views[1:]:
                out = out.unionByName(v)
            self._eav = out
        return self._eav

    def register_views(self) -> None:
        """Expose every table as a temp view for the spark.sql() surface
        (replaces the reference's Calcite adapter, SURVEY.md §3.3)."""
        for name, df in self._dfs.items():
            df.createOrReplaceTempView(name)
