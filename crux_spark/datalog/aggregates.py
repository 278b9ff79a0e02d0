"""Datalog aggregates → Spark aggregate expressions.

The reference registers aggregates via an open multimethod and applies them
with hash grouping on all non-aggregate find elements
(crux-core/src/crux/query.clj:284-408, grouping :1612-1643). Exactness
matters for oracle parity: median/count-distinct are exact, variance/stddev
are population variants (query.clj:324-343), avg coerces to double
(:279-282).

Find-element forms:
    "?x"                      plain grouping var
    ["sum", "?x"]             aggregate, default alias "sum_x"
    ["sum", "?x", "alias"]    explicit alias (oracle column-name matching)
    ["min", 3, "?x"]          top-N variant -> sorted array (query.clj:379-408)
    ["count-distinct", "?x"]  exact distinct count
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from crux_spark.datalog.builtins import is_var, var_col

_SIMPLE = {
    "count": F.count,
    "count-distinct": F.count_distinct,
    "sum": F.sum,
    "avg": F.avg,
    "median": F.median,
    "variance": F.var_pop,
    "stddev": F.stddev_pop,
    "min": F.min,
    "max": F.max,
    "distinct": F.collect_set,
    # approximate variants (not in the reference; declared explicitly so
    # exact parity stays the default — SURVEY §2.4 note)
    "count-distinct-approx": F.approx_count_distinct,
}

AGG_FNS = set(_SIMPLE) | {"rand", "sample"}

# open registry — the analogue of the reference's open `aggregate`
# multimethod (query.clj:275): register_aggregate("geo-mean",
# lambda c: F.exp(F.avg(F.log(c)))) makes ["geo-mean", "?x"] usable in
# :find. The fn maps a Column to an aggregate Column expression, so custom
# aggregates stay JVM-side (partial aggregation + codegen preserved).
_CUSTOM: dict[str, Any] = {}


def register_aggregate(name: str, fn) -> None:
    _CUSTOM[name] = fn


def is_agg_form(el: Any) -> bool:
    return (
        isinstance(el, (list, tuple))
        and len(el) >= 2
        and (el[0] in AGG_FNS or el[0] in _CUSTOM)
    )


def agg_expr(el: list) -> tuple[Column, str, str]:
    """Return (aggregate Column, alias, source var) for a find element."""
    fn = el[0]
    if isinstance(el[1], int) and fn in ("min", "max", "sample", "rand"):
        n, v = el[1], el[2]
        alias = el[3] if len(el) > 3 else f"{fn}{n}_{var_col(v)}"
        c = var_col(v)
        if fn == "min":
            return F.slice(F.sort_array(F.collect_set(c)), 1, n), alias, v
        if fn == "max":
            return F.slice(F.sort_array(F.collect_set(c), asc=False), 1, n), alias, v
        if fn == "sample":
            # N distinct samples (query.clj:362-366); deterministic variant:
            # first N of the sorted distinct set (seeded sampling would not
            # hash-match an oracle).
            return F.slice(F.sort_array(F.collect_set(c)), 1, n), alias, v
        if fn == "rand":
            return F.slice(F.sort_array(F.collect_list(c)), 1, n), alias, v
    v = el[1]
    if not is_var(v):
        raise ValueError(f"aggregate over non-var: {el!r}")
    alias = el[2] if len(el) > 2 else f"{fn.replace('-', '_')}_{var_col(v)}"
    if fn in _CUSTOM:
        return _CUSTOM[fn](F.col(var_col(v))), alias, v
    agg = _SIMPLE[fn](var_col(v))
    if fn == "avg":
        agg = _SIMPLE[fn](F.col(var_col(v)).cast("double"))
    if fn == "distinct":
        agg = F.sort_array(agg)  # deterministic order for set-valued results
    return agg, alias, v
