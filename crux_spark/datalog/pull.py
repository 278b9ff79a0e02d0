"""Pull / EQL nested projection (crux-core/src/crux/pull.clj).

The reference compiles an EQL AST to a closure tree doing batched doc-store
lookups (batch-size 100, pull.clj:184-201) with forward joins, reverse
joins (``:crux.db/_attr`` via AVE), wildcards and bounded recursion. The
Spark recast: pull = left joins against the attribute tables + struct
assembly — Catalyst batches "lookups" as joins for free, so the manual
batching disappears.

Spec forms (Python analogue of EQL):
    ["*"]                          every attribute of the entity's table
    [":name", ":age"]              named attributes
    [{":friend": [":name"]}]       forward join: value of :friend is an id
                                   into `joins[":friend"]`'s collection;
                                   array values -> array of structs
    [{":_follows": [":name"]}]     reverse join: entities whose :follows
                                   contains ?e
    [{":follows": 2}]              bounded recursion: follow the edge N
                                   levels deep, nesting structs

Forward/reverse join targets are resolved via the `joins` mapping
(attr -> collection name) passed by the caller — the schemaless reference
resolves them dynamically per doc; a typed catalog needs the hint once.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crux_spark.catalog import ID_COL, Catalog


def _table_attrs(catalog: Catalog, table: str) -> list[str]:
    return catalog._table_attrs[table]


def _entity_struct(catalog: Catalog, table: str, attrs: list[str], alias_id: str) -> tuple[DataFrame, list[str]]:
    """DataFrame of (alias_id, attr columns) for the requested attrs."""
    df = catalog.table(table)
    cols = [F.col(ID_COL).alias(alias_id)]
    names = []
    for a in attrs:
        ref = catalog.resolve_attr(a)
        cols.append(F.col(ref.column))
        names.append(ref.column)
    return df.select(*cols), names


def pull(
    catalog: Catalog,
    df: DataFrame,
    entity_col: str,
    table: str,
    spec: list,
    joins: dict[str, str] | None = None,
    out_col: str = "pull",
    _depth: int = 0,
) -> DataFrame:
    """Attach a struct column `out_col` with the pulled projection for each
    entity id in `df[entity_col]`."""
    joins = joins or {}
    if _depth > 8:
        raise ValueError("pull recursion too deep")

    plain: list[str] = []
    nested: list[tuple[str, Any]] = []
    wildcard = False
    for el in spec:
        if el == "*":
            wildcard = True
        elif isinstance(el, str):
            plain.append(el)
        elif isinstance(el, dict):
            for k, v in el.items():
                nested.append((k, v))
        else:
            raise ValueError(f"bad pull spec element {el!r}")
    if wildcard:
        nested_fwd = {a for a, _ in nested if not a.startswith(":_")}
        plain = [
            a
            for a in _table_attrs(catalog, table)
            if a not in plain and a not in nested_fwd
        ]

    base, plain_cols = _entity_struct(catalog, table, plain, "__pe")
    struct_fields: list[Column] = [
        F.col(c).alias(c) for c in plain_cols
    ]

    for attr, sub in nested:
        reverse = attr.startswith(":_")
        real_attr = ":" + attr[2:] if reverse else attr
        # bounded recursion: {attr: N} expands to a nested spec N levels
        # deep through the forward-join machinery (pull.clj:50-161's
        # recursion; bounded, so no cycle guard needed)
        if isinstance(sub, int):
            joins = {**joins, real_attr: joins.get(real_attr, table)}
            sub = ["*"] + ([{attr: sub - 1}] if sub > 1 else [])
        target = joins.get(real_attr, None)
        if target is None:
            raise ValueError(
                f"pull join {attr!r} needs a collection hint in `joins`"
            )
        ref = catalog.resolve_attr(real_attr)
        src = catalog.table(ref.table)
        if reverse:
            # entities in ref.table whose attr points at our entity
            parent = (
                F.explode(F.col(ref.column)) if ref.is_array else F.col(ref.column)
            ).alias("__parent")
            sub_plain = [el for el in sub if isinstance(el, str) and el != "*"]
            flat = (
                target == ref.table
                and len(sub_plain) == len(sub)
                and all(
                    catalog.resolve_attr(a).table == ref.table for a in sub_plain
                )
            )
            if flat:
                # the sub-entities ARE the edge rows: resolve their plain
                # attrs in the SAME scan instead of re-scanning the table
                # and joining back (3 scans -> 1 on the child table)
                sub_cols = [
                    F.col(catalog.resolve_attr(a).column).alias(
                        catalog.resolve_attr(a).column
                    )
                    for a in sub_plain
                ]
                joined = src.select(parent, F.struct(*sub_cols).alias("__sub"))
            else:
                edges = src.select(F.col(ID_COL).alias("__child"), parent)
                sub_pulled = pull(
                    catalog,
                    edges.select(F.col("__child").alias("__pe2")).distinct(),
                    "__pe2",
                    target,
                    sub,
                    joins,
                    "__sub",
                    _depth + 1,
                )
                joined = edges.join(
                    sub_pulled, edges["__child"] == sub_pulled["__pe2"], "left"
                )
            agg = joined.groupBy("__parent").agg(
                F.collect_list("__sub").alias("__subs")
            )
            base = base.join(agg, base["__pe"] == agg["__parent"], "left").drop(
                "__parent"
            )
            base = base.withColumnRenamed("__subs", f"__subs_{attr}")
            struct_fields.append(F.col(f"__subs_{attr}").alias(attr[1:]))
        else:
            if ref.is_array:
                edges = src.select(
                    F.col(ID_COL).alias("__parent"),
                    F.explode(F.col(ref.column)).alias("__child"),
                )
            else:
                edges = src.select(
                    F.col(ID_COL).alias("__parent"), F.col(ref.column).alias("__child")
                )
            sub_pulled = pull(
                catalog,
                edges.select(F.col("__child").cast("string").alias("__pe2")).distinct(),
                "__pe2",
                target,
                sub,
                joins,
                "__sub",
                _depth + 1,
            )
            joined = edges.join(
                sub_pulled,
                edges["__child"].cast("string") == sub_pulled["__pe2"],
                "left",
            )
            agg = joined.groupBy("__parent").agg(
                F.sort_array(F.collect_list("__sub")).alias("__subs")
            )
            base = base.join(agg, base["__pe"] == agg["__parent"], "left")
            base = base.drop("__parent").withColumnRenamed("__subs", f"__subs_{attr}")
            struct_fields.append(F.col(f"__subs_{attr}").alias(attr[1:]))

    assembled = base.select("__pe", F.struct(*struct_fields).alias(out_col))
    return df.join(
        assembled, df[entity_col] == assembled["__pe"], "left"
    ).drop("__pe")
