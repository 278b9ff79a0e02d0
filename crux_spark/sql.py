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
            key = "valid_time" if k == "VALIDTIME" else "tx_time"
            params[key] = parse_instant(v.group(1))
        q = q[v.end():]


def parse_instant(s: str) -> dt.datetime:
    """Parse the temporal-prefix instant, accepting the partial RFC-3339
    forms the reference does (calcite_test.clj:41-49): '2016',
    '2016-12', '2016-12-01', '2016-12-01T10:13', full ISO with Z."""
    import re

    padded = s
    if re.fullmatch(r"\d{4}", s):
        padded = s + "-01-01"
    elif re.fullmatch(r"\d{4}-\d{2}", s):
        padded = s + "-01"
    try:
        inst = dt.datetime.fromisoformat(padded.replace("Z", "+00:00"))
    except ValueError:
        raise ValueError(f"Unrecognized date/time syntax: {s}") from None
    if inst.tzinfo is not None:
        inst = inst.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return inst


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


def sql_tables_q(
    store: TxStore,
    sql: str,
    schema=None,
    args: list | dict | None = None,
) -> DataFrame:
    """Run SQL against the in-DB table-mapping documents — the full
    reference flow (calcite_test.clj): parse the temporal prefix, register
    every ``crux.sql.table/*`` doc as a view at that snapshot, run the
    bare query. ``args`` forwards to spark.sql for prepared statements
    (positional ``?`` markers, calcite_test.clj:422-427, via Spark's
    parameterized SQL)."""
    bare, params = parse_temporal_prefix(sql)
    tx = params.get("tx_id")
    if tx is None and "tx_time" in params:
        tx = store.tx_at(params["tx_time"])
    register_sql_tables(
        store, valid_time=params.get("valid_time"), tx=tx, schema=schema
    )
    if args is not None:
        return store.spark.sql(bare, args=args)
    return store.spark.sql(bare)


# single source of truth lives in the store (it tracks registry docs at
# write time); keep the historical name as an alias here
from crux_spark.bitemporal.store import SCHEMA_DOC_ATTR as SQL_TABLE_ATTR

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

    Single-entity specs — every clause ``[?e :attr ?var|literal]`` over
    one shared entity var — take a null-preserving single-scan fast path:
    one projection + literal filters over the wide-column table, no
    self-joins, and a document missing an attribute surfaces SQL NULL
    (matching the reference corpus, where nil values are stored and
    ``HOMEWORLD IS NULL`` matches — calcite_test.clj:361-368). Complex
    specs (joins, predicates, rules) compile through the full Datalog
    path with its attribute-presence semantics.

    Scale note: only the table-REGISTRY docs are collected to the driver
    (a handful of rows). The registry read goes through the store's
    write-time schema-doc side-set (TxStore.schema_doc_eids — r9
    verdict: the previous contains() over doc_json was a full snapshot
    scan that prunes nothing at 100 TB): a pushed-down eid IN-filter
    prunes the snapshot to the registry entities, with the contains()
    retained only as a residual check on those rows. The table data
    itself stays distributed — each view is a lazy compiled plan over
    the snapshot, not a materialization. ``schema`` forwards to
    Catalog.from_store to skip the inference pass at scale.

    Returns the registered view names.
    """
    import json

    from crux_spark import q
    from crux_spark.catalog import Catalog

    regs_df = _registry_docs_df(store)
    regs = regs_df.collect() if regs_df is not None else []
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
        columns = doc.get("crux.sql.table/columns") or {}
        for var in spec.get("find", []):
            if var not in columns:
                raise ValueError(f"Unrecognised column: {var}")
        for var, typ in columns.items():
            if isinstance(typ, str) and typ.startswith(":") and typ not in _SQL_TYPES:
                raise ValueError(f"Unrecognised java.sql.Types: {typ}")
        nullable = set(doc.get("crux.sql.table/nullable-columns") or [])
        df = _compile_table_spec(cat, spec, q, nullable)
        for var, typ in columns.items():
            col = var.lstrip("?")
            if col in df.columns:
                df = df.withColumn(col, F.col(col).cast(_SQL_TYPES.get(typ, typ)))
        df.createOrReplaceTempView(tname)
        names.append(tname)
    return names


def _registry_docs_df(store):
    """The table-registry read: None when the side-set proves there are
    no registry docs (zero Spark jobs), else a doc_json frame pruned by
    the eid IN-filter. Read at the CURRENT snapshot (the reference's
    Calcite schema factory follows the tx-log, so a VALIDTIME query
    still sees schema docs transacted later); only the table DATA
    time-travels. Stores without the side-set accessor (duck-typed
    stand-ins) fall back to the full contains() scan."""
    needle = f'"{SQL_TABLE_ATTR}"'
    snap = store.db()
    if hasattr(store, "schema_doc_eids"):
        eids = store.schema_doc_eids()
        if not eids:
            return None
        snap = snap.filter(F.col("eid").isin(eids))
    return (
        snap.filter(F.col("doc_json").contains(needle))
        .select("doc_json")
    )


def _compile_table_spec(cat, spec: dict, q, nullable: set = frozenset()):
    """Fast path for single-entity table specs (the dominant shape in the
    reference corpus): one pruned scan, literal WHERE filters, no
    self-joins — at scale an N-column table is one columnar projection
    instead of N-1 joins. Var columns keep triple semantics (attribute
    required) unless listed in ``nullable`` — the
    crux.sql.table/nullable-columns extension, standing in for the
    reference's stored-nil triples (calcite_test.clj:361-368 IS NULL).
    Arrays (cardinality-many) explode like the triple semantics.
    Anything else falls back to the Datalog compiler."""
    find = spec.get("find", [])
    clauses = spec.get("where", [])
    evars = {c[0] for c in clauses if isinstance(c, (list, tuple)) and len(c) == 3}
    simple = (
        len(evars) == 1
        and not spec.get("rules")
        and not spec.get("in")
        and all(
            isinstance(c, (list, tuple))
            and len(c) == 3
            and isinstance(c[1], str)
            and c[1].startswith(":")
            for c in clauses
        )
    )
    if not simple:
        return q(cat, spec)
    evar = next(iter(evars))
    if evar not in find:
        return q(cat, spec)
    # resolve the one table this entity var scans (single-collection
    # catalogs — the Node/TxStore path — have exactly one)
    table_names = cat.tables()
    if len(table_names) != 1:
        return q(cat, spec)
    df = cat.table(table_names[0])
    from crux_spark.catalog import ID_COL
    from pyspark.sql import types as T

    def is_arr(colname: str) -> bool:
        return colname in df.columns and isinstance(
            df.schema[colname].dataType, T.ArrayType
        )

    sel = {evar: ID_COL}
    for ci, c in enumerate(clauses):
        _, attr, v = c
        colname = attr[1:]
        if isinstance(v, str) and v.startswith("?"):
            if v in sel or v == evar:
                # repeated var = unification, not the simple shape
                return q(cat, spec)
            opt = v in nullable
            if colname not in df.columns:
                # attribute absent from the schema entirely: typed null
                # (only visible for nullable columns)
                df = df.withColumn(colname, F.lit(None).cast("string"))
                if not opt:
                    df = df.filter(F.lit(False))
            elif is_arr(colname):
                # cardinality-many: one output row per element. The flat
                # name is unique PER CLAUSE: two clauses binding the same
                # array attribute to different vars ([?e :a ?x] [?e :a ?y])
                # must each explode independently, yielding the full
                # element cross-product like the Datalog path — a shared
                # name would make the second withColumn clobber the first
                # and force ?x == ?y.
                flat = f"{colname}__flat{ci}"
                exp = F.explode_outer if opt else F.explode
                df = df.withColumn(flat, exp(F.col(colname)))
                colname = flat
            elif not opt:
                df = df.filter(F.col(colname).isNotNull())
            sel[v] = colname
        elif v == "_":
            pass
        elif colname not in df.columns:
            df = df.filter(F.lit(False))
        elif is_arr(colname):
            df = df.filter(F.array_contains(F.col(colname), F.lit(v)))
        else:
            df = df.filter(F.col(colname) == F.lit(v))
    if any(v not in sel for v in find):
        return q(cat, spec)
    return df.select(*[F.col(sel[v]).alias(v.lstrip("?")) for v in find])


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
