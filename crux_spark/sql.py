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
