"""SQL surface over bitemporal snapshots.

The reference runs SQL through a Calcite adapter that rewrites RelNodes
into Datalog, with a temporal prefix syntax
``VALIDTIME ('...') TRANSACTIONTIME ('...') SELECT ...``
(crux-sql/src/crux/calcite.clj:51-71, SURVEY.md §3.3). The Spark recast
skips all of it: the bitemporal snapshot at (valid-time, tx) registers as
a temp view — typed via a user schema, like the reference's table-mapping
documents (calcite.clj:459-466) — and ``spark.sql()`` queries it with the
full Spark SQL surface.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crux_spark.bitemporal.store import TxStore


def parse_temporal_prefix(sql: str) -> tuple[str, dict]:
    """Parse the reference's SQL temporal prefix
    (crux-sql/src/crux/calcite.clj:51-71):

        [-- comments] [VALIDTIME ('inst')] [TRANSACTIONTIME ('inst')]
        [TRANSACTIONID (n)] SELECT ...

    Keywords repeat in any order (last wins, like the reference's loop);
    returns (bare_sql, params) with params keys 'valid_time' (datetime),
    'tx_time' (datetime), 'tx_id' (int)."""
    import re

    params: dict = {}

    def strip_comments(s: str) -> str:
        s = s.strip()
        while s.startswith("--"):
            s = re.sub(r"^--.*", "", s, count=1).strip()
        return s

    q = strip_comments(sql)
    while True:
        m = re.match(r"^\s*(TRANSACTIONTIME|VALIDTIME|TRANSACTIONID)", q)
        if not m:
            return q.strip(), params
        k = m.group(1)
        q = strip_comments(q[m.end():])
        if k == "TRANSACTIONID":
            v = re.match(r"^\s*\((\d+)\)", q)
            if not v:
                raise ValueError(f"expected (n) after {k} in {sql!r}")
            params["tx_id"] = int(v.group(1))
        else:
            v = re.match(r"^\s*\('(.+?)'\)", q)
            if not v:
                raise ValueError(f"expected ('inst') after {k} in {sql!r}")
            inst = dt.datetime.fromisoformat(v.group(1).replace("Z", "+00:00"))
            if inst.tzinfo is not None:
                inst = inst.astimezone(dt.timezone.utc).replace(tzinfo=None)
            key = "valid_time" if k == "VALIDTIME" else "tx_time"
            params[key] = inst
        q = q[v.end():]


def sql_q(
    store: TxStore,
    sql: str,
    name: str = "docs",
    schema: str | None = None,
) -> DataFrame:
    """Run a SQL string with the reference's temporal prefix against a
    store: the prefix picks the snapshot, the rest runs through spark.sql
    on the registered view. TRANSACTIONTIME maps to the tx *id* visible at
    that wall-clock instant (the reference resolves tx-time → tx-id via the
    log; here tx ids are totally ordered so max tx_from ≤ t serves)."""
    bare, params = parse_temporal_prefix(sql)
    tx = params.get("tx_id")
    if tx is None and "tx_time" in params:
        tx = store.tx_at(params["tx_time"])
    temporal_view(
        store, name, valid_time=params.get("valid_time"), tx=tx, schema=schema
    )
    return store.spark.sql(bare)


SQL_TABLE_ATTR = "crux.sql.table/name"

# the reference's Calcite column-type keywords (calcite.clj table docs,
# e.g. {:crux.sql.table/columns {?id :keyword ?name :varchar ?age :bigint}})
# mapped to Spark DDL; plain Spark DDL strings pass through untouched
_SQL_TYPES = {
    ":varchar": "string",
    ":keyword": "string",  # OTHER in Calcite (calcite.clj:426-439)
    ":uuid": "string",     # OTHER in Calcite
    ":bigint": "bigint",
    ":int": "int",
    ":float": "float",
    ":double": "double",
    ":decimal": "decimal(28,8)",
    ":boolean": "boolean",
    ":timestamp": "timestamp",
}


def register_sql_tables(
    store: TxStore,
    valid_time: dt.datetime | None = None,
    tx: int | None = None,
    schema=None,
) -> list[str]:
    """Register SQL tables from table-mapping documents stored IN the
    database — the reference's Calcite flow (crux-sql/src/crux/
    calcite.clj:459-466): any document carrying

        {"crux.sql.table/name":    "person",
         "crux.sql.table/query":   {datalog spec},
         "crux.sql.table/columns": {"?id": ":varchar", "?age": ":bigint"}}

    becomes a Spark temp view named by table/name, backed by compiling
    the stored Datalog query against the same snapshot, with find-vars
    cast per the columns map (SQL column = var without the '?').

    Scale note: only the table-REGISTRY docs are collected to the driver
    (a handful of rows, pre-filtered by a pushed contains() on doc_json);
    the table data itself stays distributed — each view is a lazy
    compiled plan over the snapshot, not a materialization. ``schema``
    forwards to Catalog.from_store to skip the inference pass at scale.

    Returns the registered view names.
    """
    import json

    from crux_spark import q
    from crux_spark.catalog import Catalog

    snap = store.db(valid_time, tx)
    regs = (
        snap.filter(F.col("doc_json").contains(f'"{SQL_TABLE_ATTR}"'))
        .select("doc_json")
        .collect()
    )
    if not regs:
        return []
    cat = Catalog.from_store(store, valid_time, tx, schema=schema)
    names: list[str] = []
    for r in regs:
        doc = json.loads(r.doc_json)
        tname = doc[SQL_TABLE_ATTR]
        spec = doc.get("crux.sql.table/query")
        if spec is None:
            raise ValueError(f"table doc {tname!r} lacks crux.sql.table/query")
        df = q(cat, spec)
        for var, typ in (doc.get("crux.sql.table/columns") or {}).items():
            col = var.lstrip("?")
            if col in df.columns:
                df = df.withColumn(col, F.col(col).cast(_SQL_TYPES.get(typ, typ)))
        df.createOrReplaceTempView(tname)
        names.append(tname)
    return names


def temporal_view(
    store: TxStore,
    name: str,
    valid_time: dt.datetime | None = None,
    tx: int | None = None,
    schema: str | None = None,
) -> DataFrame:
    """Register the snapshot visible at (valid_time, tx) as temp view
    ``name`` and return its DataFrame.

    ``schema`` is a Spark DDL string for the document shape, e.g.
    ``"id string, balance long"`` — the analogue of
    :crux.sql.table/columns. Without it the view exposes (eid, doc_json).
    """
    snap = store.db(valid_time, tx)
    if schema:
        snap = snap.select(
            "eid", F.from_json("doc_json", schema).alias("doc")
        ).select("eid", "doc.*")
    snap.createOrReplaceTempView(name)
    return snap
