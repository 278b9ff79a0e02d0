"""Datalog query surface.

``q(catalog, query, *args)`` compiles a Crux-style Datalog query (expressed
as Python lists/dicts, the EDN analogue) into a DataFrame logical plan and
returns the result DataFrame. Catalyst does join ordering, predicate
pushdown and physical strategy — replacing the reference's stats-driven
greedy join order + leapfrog n-ary join (crux-core/src/crux/query.clj:586-703,
crux-core/src/crux/index.clj:179-320).
"""

from crux_spark.datalog.compile import (
    QueryTimeoutError,
    compile_query,
    q,
    q_eager,
)

__all__ = ["q", "q_eager", "compile_query", "QueryTimeoutError"]
