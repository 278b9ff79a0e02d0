"""Predicate/function registry for Datalog expression clauses.

The reference allowlists ~230 clojure.core fns as query predicates
(crux-core/resources/query-allowlist.edn, enforced at
crux-core/src/crux/query.clj:1272-1283). Here the corpus-used subset maps to
JVM-side Catalyst expressions (pyspark.sql.functions) so predicates stay
inside whole-stage codegen; there is deliberately no row-at-a-time Python
UDF path in the hot loop.

Expression forms (Python analogue of the EDN clause):
    ["+", "?a", 1]                -> F.col(a) + 1
    ["<", "?qty", 24]             -> F.col(qty) < 24
    ["re-find", "^forest.*", "?n"]-> F.col(n).rlike("^forest.*")
    ["contains?", {"A","B"}, "?x"]-> F.col(x).isin("A","B")
    ["subs", "?s", 0, 2]          -> substring(s, 1, 2)   (clojure subs is
                                     0-based / end-exclusive; codegen'd)
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_var(x: Any) -> bool:
    return isinstance(x, str) and x.startswith("?")


def is_kw(x: Any) -> bool:
    return isinstance(x, str) and x.startswith(":")


def is_blank(x: Any) -> bool:
    return x == "_"


def var_col(v: str) -> str:
    """Column name for a logic var: strip the '?' sigil."""
    return v[1:]


def _lit(x: Any) -> Column:
    if isinstance(x, str) and x.startswith(":"):
        return F.lit(x)  # keyword literal stored as its string form
    if isinstance(x, (_dt.datetime, _dt.date)):
        return F.lit(x)
    return F.lit(x)


def _div(a: Column, b: Column) -> Column:
    return a / b


_BINARY_OPS: dict[str, Callable[[Column, Column], Column]] = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": _div,
    "quot": lambda a, b: (a / b).cast("long"),
    "rem": lambda a, b: a % b,
    "mod": lambda a, b: ((a % b) + b) % b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "=": lambda a, b: a == b,
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "not=": lambda a, b: a != b,
}


class ExprBuilder:
    """Builds Catalyst Column expressions from clause forms.

    ``colmap`` maps logic var -> Column; ``env`` maps scalar :in vars to
    Python literal values (substituted at compile time — the analogue of the
    reference binding :in args into relation indexes, query.clj:1528-1533).
    """

    def __init__(
        self,
        columns: set[str],
        env: dict[str, Any],
        dtypes: dict[str, str] | None = None,
        typed: dict[str, dict[str, str]] | None = None,
    ):
        self.columns = columns
        self.env = env
        # col name -> Spark simpleString type, for the few type-polymorphic
        # builtins (clojure `count` = string length OR collection size)
        self.dtypes = dtypes or {}
        # EAV-fallback vars with typed side-columns: var -> {kind: colname}.
        # Numeric/temporal comparisons bind against these instead of the
        # stringified value column (codec.clj:81-99's typed ordering).
        self.typed = typed or {}

    def vars_in(self, form: Any) -> set[str]:
        """All logic vars referenced by an expression form (excluding
        env-substituted scalars)."""
        out: set[str] = set()
        if is_var(form):
            if form not in self.env:
                out.add(form)
        elif isinstance(form, (list, tuple)):
            for a in form[1:]:
                out |= self.vars_in(a)
        return out

    def build(self, form: Any) -> Column:
        if is_var(form):
            if form in self.env:
                return _lit(self.env[form])
            return F.col(var_col(form))
        if isinstance(form, (list, tuple)):
            return self._call(form[0], list(form[1:]))
        if isinstance(form, (set, frozenset)):
            raise ValueError("set literal only valid as contains?/isin argument")
        return _lit(form)

    # -- function dispatch ------------------------------------------------

    _CHAINED_CMPS = {"<", "<=", ">", ">=", "=", "==", "!=", "not="}

    def _call(self, fn: str, args: list[Any]) -> Column:
        # a callable :in arg used in function position is a user predicate
        # (DataScript 'passing predicate as source', query_test.clj:2543);
        # row-at-a-time Python UDF — the deliberate escape hatch, not the
        # hot path
        if is_var(fn) and callable(self.env.get(fn)):
            udf = F.udf(self.env[fn], "boolean")
            return udf(*[self.build(a) for a in args])
        if fn in _BINARY_OPS:
            ctx = (
                "num"
                if fn in ("+", "-", "*", "/", "quot", "rem", "mod")
                else self._cmp_context(args)
            )
            cols = [self._build_ctx(a, ctx) for a in args]
            if fn in self._CHAINED_CMPS and len(cols) > 2:
                # variadic comparison chains pairwise: (< a 18 b) means
                # a < 18 AND 18 < b (clojure semantics), NOT ((a<18)<b)
                out = _BINARY_OPS[fn](cols[0], cols[1])
                for x, y in zip(cols[1:], cols[2:]):
                    out = out & _BINARY_OPS[fn](x, y)
                return out
            out = cols[0]
            for c in cols[1:]:
                out = _BINARY_OPS[fn](out, c)
            return out
        meth = getattr(self, "_fn_" + fn.replace("-", "_").replace("?", "p").replace("/", "_"), None)
        if meth is None:
            raise NotImplementedError(f"Datalog builtin not implemented: {fn!r}")
        return meth(args)

    _NUMERIC_DTYPES = (
        "tinyint", "smallint", "int", "bigint", "float", "double",
    )

    def _cmp_context(self, args: list[Any]) -> str | None:
        """Type context of a comparison: 'ts' if any operand is temporal,
        'num' if any is numeric, else None (string compare)."""
        ctx = None
        for x in args:
            if is_var(x) and x not in self.env:
                dt = self.dtypes.get(var_col(x), "")
                if dt in ("timestamp", "timestamp_ntz", "date"):
                    return "ts"
                if dt in self._NUMERIC_DTYPES or dt.startswith("decimal"):
                    ctx = "num"
            elif isinstance(x, (list, tuple)):
                sub = self._cmp_context(list(x[1:]))
                if sub == "ts":
                    return "ts"
                ctx = ctx or sub
            else:
                lit = self.env.get(x, x) if isinstance(x, str) else x
                if isinstance(lit, (_dt.datetime, _dt.date)):
                    return "ts"
                if isinstance(lit, (int, float)) and not isinstance(lit, bool):
                    ctx = "num"
        return ctx

    def _build_ctx(self, form: Any, ctx: str | None) -> Column:
        """Build an operand under a comparison type context: an EAV-bound
        var with typed side-columns binds the matching typed column instead
        of its stringified form; raise if the typed column was projected
        away (never silently string-compare a typed predicate)."""
        if ctx in ("num", "ts") and is_var(form) and form in self.typed:
            col = self.typed[form].get(ctx)
            if col is None or col not in self.columns:
                raise ValueError(
                    f"typed ({ctx}) predicate over EAV-bound var {form}, but "
                    f"its typed side-column is unavailable — bind the value "
                    f"through a fixed attribute or keep {form} out of "
                    f"projections before the predicate"
                )
            return F.col(col)
        return self.build(form)

    # arithmetic / numeric
    def _fn_inc(self, a):
        return self.build(a[0]) + 1

    def _fn_dec(self, a):
        return self.build(a[0]) - 1

    def _fn_abs(self, a):
        return F.abs(self.build(a[0]))

    def _fn_min(self, a):
        return F.least(*[self.build(x) for x in a])

    def _fn_max(self, a):
        return F.greatest(*[self.build(x) for x in a])

    def _fn_round(self, a):
        # (round x n) — engine extension for oracle-stable float compares
        return F.round(self.build(a[0]), a[1] if len(a) > 1 else 0)

    def _fn_long(self, a):
        return self.build(a[0]).cast("long")

    def _fn_double(self, a):
        return self.build(a[0]).cast("double")

    def _fn_int(self, a):
        return self.build(a[0]).cast("int")

    def _fn_bigdec(self, a):
        return self.build(a[0]).cast("decimal(38,12)")

    def _fn_decimal(self, a):
        # deterministic-sum cast: float -> DECIMAL(28,8) so aggregation is
        # order-independent and hash-matches the oracle exactly
        return self.build(a[0]).cast("decimal(28,8)")

    # boolean
    def _fn_and(self, a):
        out = self.build(a[0])
        for x in a[1:]:
            out = out & self.build(x)
        return out

    def _fn_or(self, a):
        out = self.build(a[0])
        for x in a[1:]:
            out = out | self.build(x)
        return out

    def _fn_not(self, a):
        return ~self.build(a[0])

    def _fn_nilp(self, a):
        return self.build(a[0]).isNull()

    def _fn_somep(self, a):
        return self.build(a[0]).isNotNull()

    # strings (clojure.core + clojure.string subset used by the corpus —
    # tpch.clj q20 re-find, q22 subs/contains?)
    def _fn_str(self, a):
        return F.concat(*[self.build(x).cast("string") for x in a])

    def _fn_subs(self, a):
        s = self.build(a[0])
        start = a[1]
        if len(a) > 2:
            return s.substr(F.lit(start + 1), F.lit(a[2] - start))
        return s.substr(F.lit(start + 1), F.length(s))

    def _fn_count(self, a):
        # clojure count: string length or collection size (type-resolved
        # at compile time from the bound column's dtype)
        c = self.build(a[0])
        if is_var(a[0]) and self.dtypes.get(var_col(a[0]), "").startswith(
            ("array", "map")
        ):
            return F.size(c)
        if isinstance(a[0], (list, tuple)) and not is_var(a[0]):
            # nested call — assume collection-returning (vec/sort/...)
            return F.size(c)
        return F.length(c)

    def _fn_size(self, a):
        return F.size(self.build(a[0]))

    def _fn_lower_case(self, a):
        return F.lower(self.build(a[0]))

    def _fn_upper_case(self, a):
        return F.upper(self.build(a[0]))

    def _fn_trim(self, a):
        return F.trim(self.build(a[0]))

    def _fn_starts_withp(self, a):
        return self.build(a[0]).startswith(a[1])

    def _fn_ends_withp(self, a):
        return self.build(a[0]).endswith(a[1])

    def _fn_includesp(self, a):
        return self.build(a[0]).contains(a[1])

    def _fn_re_find(self, a):
        # (re-find #"pat" s) — truthy iff pattern matches anywhere
        pattern, s = a[0], a[1]
        return self.build(s).rlike(pattern)

    def _fn_re_matches(self, a):
        pattern, s = a[0], a[1]
        p = pattern if pattern.startswith("^") else "^" + pattern
        p = p if p.endswith("$") else p + "$"
        return self.build(s).rlike(p)

    def _fn_containsp(self, a):
        # (contains? #{...} x) — set-membership filter
        coll, x = a[0], a[1]
        if isinstance(coll, (set, frozenset, list, tuple)):
            vals = [self.env.get(v, v) if isinstance(v, str) else v for v in coll]
            return self.build(x).isin(*vals)
        return F.array_contains(self.build(coll), self.build(x))

    def _fn_get(self, a):
        return self.build(a[0]).getItem(self.build(a[1]))

    # temporal helpers (dates are TimestampType, ms precision — codec.clj:252-255)
    def _fn_year(self, a):
        return F.year(self.build(a[0]))

    def _fn_month(self, a):
        return F.month(self.build(a[0]))

    def _fn_day(self, a):
        return F.dayofmonth(self.build(a[0]))

    def _fn_date(self, a):
        return F.lit(a[0]).cast("timestamp")

    def _fn_current_date(self, a):
        return F.current_date()

    def _fn_current_timestamp(self, a):
        return F.current_timestamp()

    def _fn_last_day(self, a):
        return F.last_day(self.build(a[0]))

    def _fn_date_trunc(self, a):
        return F.date_trunc(a[0], self.build(a[1]))

    # SQL scalar surface parity (crux-sql/src/crux/calcite.clj:147-203)
    def _fn_ceil(self, a):
        return F.ceil(self.build(a[0]))

    def _fn_floor(self, a):
        return F.floor(self.build(a[0]))

    def _fn_truncate(self, a):
        c = self.build(a[0])
        if len(a) > 1:
            p = 10 ** a[1]
            return (c * p).cast("long") / F.lit(p)
        return c.cast("long")

    def _fn_initcap(self, a):
        return F.initcap(self.build(a[0]))

    def _fn_concat(self, a):
        return F.concat(*[self.build(x) for x in a])

    def _fn_char_length(self, a):
        return F.length(self.build(a[0]))

    def _fn_replace(self, a):
        return F.replace(self.build(a[0]), F.lit(a[1]), F.lit(a[2]))

    def _fn_ltrim(self, a):
        return F.ltrim(self.build(a[0]))

    def _fn_rtrim(self, a):
        return F.rtrim(self.build(a[0]))

    def _fn_substring(self, a):
        # SQL 1-based SUBSTRING(s, start, len?)
        s = self.build(a[0])
        if len(a) > 2:
            return F.substring(s, a[1], a[2])
        return s.substr(F.lit(a[1]), F.length(s))

    # additional clojure.core corpus fns (query-allowlist.edn subset)
    def _fn_name(self, a):
        # (name :ns/kw) -> "kw"; our keywords are ":..." strings
        c = self.build(a[0])
        return F.element_at(F.split(F.regexp_replace(c, "^:", ""), "/"), -1)

    def _fn_namespace(self, a):
        c = self.build(a[0])
        parts = F.split(F.regexp_replace(c, "^:", ""), "/")
        return F.when(F.size(parts) > 1, F.element_at(parts, 1))

    def _fn_keyword(self, a):
        return F.concat(F.lit(":"), self.build(a[0]).cast("string"))

    def _fn_first(self, a):
        return F.element_at(self.build(a[0]), 1)

    def _fn_last(self, a):
        return F.element_at(self.build(a[0]), -1)

    def _fn_nth(self, a):
        return F.element_at(self.build(a[0]), self.build(a[1]) + 1)

    def _fn_reverse(self, a):
        return F.reverse(self.build(a[0]))

    def _fn_sort(self, a):
        return F.sort_array(self.build(a[0]))

    def _fn_vec(self, a):
        return self.build(a[0])

    def _fn_set(self, a):
        return F.array_distinct(self.build(a[0]))

    def _fn_range(self, a):
        if len(a) == 1:
            return F.sequence(F.lit(0), self.build(a[0]) - 1)
        return F.sequence(self.build(a[0]), self.build(a[1]) - 1)

    def _fn_take(self, a):
        return F.slice(self.build(a[1]), 1, a[0])

    def _fn_conj(self, a):
        return F.array_append(self.build(a[0]), self.build(a[1]))

    def _fn_numberp(self, a):
        return self.build(a[0]).cast("double").isNotNull()

    def _fn_stringp(self, a):
        return self.build(a[0]).cast("string").isNotNull()

    def _fn_boolean(self, a):
        return self.build(a[0]).cast("boolean")

    def _fn_identity(self, a):
        return self.build(a[0])

    def _fn_vector(self, a):
        # (vector 1 2 3) — array literal constructor
        return F.array(*[self.build(x) for x in a])

    def _fn_tuple(self, a):
        # (tuple 1 "x") — heterogeneous tuple as struct (Spark arrays are
        # homogeneous under ANSI; a struct is the positional-tuple analogue)
        return F.struct(
            *[self.build(x).alias(f"_{i}") for i, x in enumerate(a)]
        )

    def _fn_evenp(self, a):
        return self.build(a[0]) % 2 == 0

    def _fn_oddp(self, a):
        return self.build(a[0]) % 2 == 1
