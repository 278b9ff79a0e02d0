"""Lucene multi-field query-string search — the reference's alternative
Lucene indexer that indexes EVERY string attribute of a document as its
own field and exposes QueryParser syntax through the
``lucene-text-search`` predicate
(crux-lucene/src/crux/lucene/multi_field.clj:18-76; corpus:
crux-lucene/test/crux/lucene/multi_field_test.clj).

Spark recast: the per-field inverted indexes already exist as
DataFrames (compile.py's cached ``_text_av_index`` per (table, column)),
so the multi-field surface is (1) a QueryParser-subset parser producing
an AST of field terms under AND/OR/NOT, and (2) an evaluator that maps
each field term to a scored (eid, w) relation and combines relations
with joins/unions — every operator a broadcast-able eid-keyed
DataFrame op, no driver-side scan.

Query grammar (the subset the reference corpus exercises):
    query   := or
    or      := and (("OR" | "||") and)*
    and     := unit (("AND" | "&&" | "NOT") unit)*   # a NOT b = a AND NOT b
    unit    := "(" or ")" | term
    term    := [field ":"] word       # word may hold * and ? wildcards
Backslash escapes the next char (``person\\/surname: Smith``); AND/OR/
NOT are recognized uppercase, like Lucene. Field-less words search the
default field ""), which indexes nothing — they match no documents,
matching QueryParser-with-empty-default-field behavior. Malformed input
(dangling operators, bare special characters like ``+12!``) raises
LuceneParseError("Cannot parse ..."), the reference's ParseException
surface. Scores are the engine's tf-idf (wildcard clauses constant 1.0,
as in text_search.search_av) rather than Lucene's BM25 — the scored
[[?e ?score]] binding shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class LuceneParseError(ValueError):
    """QueryParser rejection — message starts with 'Cannot parse'."""


_WORD_OK = set("abcdefghijklmnopqrstuvwxyz"
               "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
               "*?._-/")


def _tokenize(q: str) -> list:
    """Tokens: ('(',), (')',), ('OP', name), ('TERM', field|None, word).
    A word ending in an unescaped ':' carries the field for the NEXT
    word ("firstname: Fred"); an embedded ':' splits in place."""
    toks: list = []
    i, n = 0, len(q)
    pending_field: str | None = None

    def flush_word(raw: str, field_sep: int | None, trailing_colon: bool):
        nonlocal pending_field
        if trailing_colon:
            if pending_field is not None:
                raise LuceneParseError(
                    f"Cannot parse '{q}': field with no term"
                )
            pending_field = raw
            return
        if field_sep is not None:
            if pending_field is not None:
                # "firstname: foo:bar" — the detached field never got a
                # term; dropping it silently would change the query
                raise LuceneParseError(
                    f"Cannot parse '{q}': field with no term"
                )
            field, word = raw[:field_sep], raw[field_sep + 1 :]
        else:
            field, word = pending_field, raw
        pending_field = None
        if field is None and word in ("AND", "OR", "NOT", "&&", "||"):
            toks.append(("OP", "NOT" if word == "NOT" else
                         ("AND" if word in ("AND", "&&") else "OR")))
            return
        if not word:
            raise LuceneParseError(f"Cannot parse '{q}': empty term")
        toks.append(("TERM", field, word))

    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
            continue
        if c in "()":
            if pending_field is not None:
                raise LuceneParseError(f"Cannot parse '{q}': field with no term")
            toks.append((c,))
            i += 1
            continue
        # read one word
        buf: list[str] = []
        field_sep: int | None = None
        trailing_colon = False
        while i < n and not q[i].isspace() and q[i] not in "()":
            if q[i] == "\\":
                if i + 1 >= n:
                    raise LuceneParseError(f"Cannot parse '{q}': dangling escape")
                buf.append(q[i + 1])
                i += 2
                continue
            if q[i] == ":":
                if field_sep is not None:
                    raise LuceneParseError(f"Cannot parse '{q}': nested ':'")
                if i + 1 >= n or q[i + 1].isspace():
                    trailing_colon = True
                    i += 1
                    break
                field_sep = len(buf)
                buf.append(":")  # placeholder, split below
                i += 1
                continue
            if q[i] not in _WORD_OK:
                raise LuceneParseError(
                    f"Cannot parse '{q}': unexpected character {q[i]!r}"
                )
            buf.append(q[i])
            i += 1
        flush_word("".join(buf), field_sep, trailing_colon)
    if pending_field is not None:
        raise LuceneParseError(f"Cannot parse '{q}': field with no term")
    return toks


def parse_query(q: str):
    """Parse into an AST of ('term', field, word) / ('and'|'or'|'not',
    left, right). 'not' is binary — Lucene rejects a pure negative
    query, and so do we."""
    toks = _tokenize(q)
    if not toks:
        raise LuceneParseError(f"Cannot parse '{q}': empty query")
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_unit():
        t = peek()
        if t is None:
            raise LuceneParseError(f"Cannot parse '{q}': expected term")
        if t[0] == "(":
            take()
            node = parse_or()
            if peek() is None or peek()[0] != ")":
                raise LuceneParseError(f"Cannot parse '{q}': missing ')'")
            take()
            return node
        if t[0] == "TERM":
            take()
            return ("term", t[1], t[2])
        raise LuceneParseError(f"Cannot parse '{q}': unexpected {t!r}")

    def parse_and():
        node = parse_unit()
        while peek() is not None and peek()[0] == "OP" and peek()[1] in ("AND", "NOT"):
            op = take()[1]
            rhs = parse_unit()
            node = ("and" if op == "AND" else "not", node, rhs)
        return node

    def parse_or():
        node = parse_and()
        while True:
            t = peek()
            if t is None or t[0] == ")":
                return node
            if t[0] == "OP" and t[1] == "OR":
                take()
                node = ("or", node, parse_and())
            elif t[0] == "OP":
                raise LuceneParseError(f"Cannot parse '{q}': dangling {t[1]}")
            else:
                # implicit adjacency = OR (QueryParser default operator)
                node = ("or", node, parse_and())

    node = parse_or()
    if pos != len(toks):
        raise LuceneParseError(f"Cannot parse '{q}': trailing {toks[pos]!r}")
    return node


def evaluate(spark, ast, index_for) -> DataFrame:
    """Evaluate an AST to a scored (eid, score) relation. ``index_for``
    maps a field name to (postings, doc_freq, n_docs) or None when the
    field indexes nothing (unknown attribute, or the empty default
    field). Combinators: OR = union + sum, AND = inner join + sum,
    NOT = left-anti — all eid-keyed DataFrame ops."""
    from crux_spark.functions.text_search import search_av

    empty = spark.createDataFrame([], "eid string, score double")

    def ev(node) -> DataFrame:
        kind = node[0]
        if kind == "term":
            _, field, word = node
            idx = index_for(field) if field else None
            if idx is None:
                return empty
            return (
                search_av(*idx, word)
                .groupBy("eid")
                .agg(F.sum("score").alias("score"))
            )
        a, b = ev(node[1]), ev(node[2])
        if kind == "or":
            return (
                a.unionByName(b).groupBy("eid").agg(F.sum("score").alias("score"))
            )
        if kind == "and":
            return (
                a.join(b.withColumnRenamed("score", "__s2"), "eid")
                .select("eid", (F.col("score") + F.col("__s2")).alias("score"))
            )
        return a.join(b.select("eid"), "eid", "left_anti")  # not

    out = ev(ast)
    return out.select("eid", F.round("score", 6).alias("score"))


def lucene_text_search_constraint(compiler, df, form, binding) -> DataFrame:
    """The ``lucene-text-search`` pred constraint
    (multi_field.clj:59-63): form is
    (lucene-text-search query-string args...) where the query may hold
    %s placeholders filled from :in-bound args (the reference applies
    clojure format), binding is [[?e]] or [[?e ?score]]. Registered in
    PRED_CONSTRAINTS at import — the open registry the reference's
    defmethod uses (query.clj:269-273)."""
    raw = form[1]
    if isinstance(raw, str) and raw.startswith("?"):
        raw = compiler.env.get(raw, raw)
        if isinstance(raw, str) and raw.startswith("?"):
            raise NotImplementedError(
                "lucene-text-search query must be a literal or :in-bound "
                f"value, got unbound var {form[1]!r}"
            )
    if not isinstance(raw, str):
        raise ValueError("lucene-text-search query must be String")
    args = []
    for a in form[2:]:
        if isinstance(a, str) and a.startswith("?"):
            if a not in compiler.env:
                raise NotImplementedError(
                    f"lucene-text-search format arg {a!r} must be :in-bound"
                )
            args.append(compiler.env[a])
        else:
            args.append(a)
    q = (raw % tuple(args)) if args else raw

    from crux_spark.catalog import ID_COL

    def index_for(field: str):
        try:
            ref = compiler.catalog.resolve_attr(":" + field)
        except Exception:
            ref = None
        if ref is None:
            return None
        tdf = compiler.catalog.table(ref.table)
        dt = tdf.schema[ref.column].dataType.simpleString()
        if dt not in ("string", "array<string>") or ref.column == ID_COL:
            # the reference indexes only string-valued attributes
            # (multi_field.clj:27 ``(filter (comp string? val) doc)``)
            return None
        return compiler._text_av_index(ref.table, ref.column)

    rel = evaluate(compiler.spark, parse_query(q), index_for)
    if not (
        isinstance(binding, (list, tuple))
        and binding
        and isinstance(binding[0], (list, tuple))
    ):
        raise ValueError(
            f"lucene-text-search requires a relation binding, got {binding!r}"
        )
    from crux_spark.datalog.builtins import is_blank, var_col

    inner = binding[0]
    order = ["eid", "score"]
    sel = []
    for i, v in enumerate(inner):
        if is_blank(v):
            continue
        src = F.col(order[i]) if i < len(order) else F.lit(None)
        sel.append(src.alias(var_col(v)))
    proj = rel.select(*sel)
    shared = sorted(set(df.columns) & set(proj.columns))
    if shared:
        return df.join(proj, on=shared, how="inner")
    return df.crossJoin(proj)


def register() -> None:
    from crux_spark.datalog.compile import register_pred_constraint

    register_pred_constraint("lucene-text-search", lucene_text_search_constraint)


register()
