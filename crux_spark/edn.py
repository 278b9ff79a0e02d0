"""Minimal EDN reader/printer for the HTTP surface.

The reference's HTTP server content-negotiates EDN/JSON/transit
(crux-http-server/src/crux/http_server.clj ->content-type); this module
implements the EDN subset its query API exchanges — nil, booleans,
integers, floats, decimals (M suffix), strings, keywords, symbols,
#inst tagged instants, vectors, lists, maps, and sets — per the public
EDN spec (github.com/edn-format/edn).

Python mapping (matches the repo's internal conventions):

- keyword  <-> str starting with ":" (the engine already spells
  attributes ":n_name"; non-ASCII keyword chars print bare, like the
  reference's printer)
- symbol   <-> plain str (variables are "?e" strings internally)
- #inst    <-> datetime.datetime / datetime.date
- nil      <-> None, vector/list <-> list, map <-> dict, set <-> set
- 42M      <-> decimal.Decimal
- 42N      <-> crux_spark.valuetypes.BigInt (codec tag 12)
- \\c       <-> crux_spark.valuetypes.Char (codec tag 9; named chars
  newline/space/tab/return/backspace/formfeed and \\uXXXX supported)
- 1/3      -> float (ratios read as doubles — the JSON surface has no
  ratio type either; the reference's EDN reader returns a Ratio, which
  this engine's query layer would coerce numerically anyway)

Printing disambiguates: a str starting with ":" prints as a keyword,
anything else as a quoted string.
"""

from __future__ import annotations

import datetime as dt
import re
from decimal import Decimal

from crux_spark.valuetypes import BigInt, BigInteger, Char

__all__ = ["dumps", "loads"]

_CHAR_NAMES = {
    "\n": "newline", " ": "space", "\t": "tab",
    "\r": "return", "\b": "backspace", "\f": "formfeed",
}
_NAMED_CHARS = {v: k for k, v in _CHAR_NAMES.items()}


# ---------------------------------------------------------------------------
# printer

def dumps(x) -> str:
    if x is None:
        return "nil"
    if x is True:
        return "true"
    if x is False:
        return "false"
    if isinstance(x, Char):
        c = str(x)
        if c in _CHAR_NAMES:
            return "\\" + _CHAR_NAMES[c]
        # whitespace-class chars (incl. \x1c-\x1f, which Python's re
        # counts as \s and the tokenizer would split) and unprintable
        # BMP chars print as \uXXXX; everything else prints raw — the
        # reader's \S branch takes any single non-whitespace codepoint
        if c.isspace() or (not c.isprintable() and ord(c) <= 0xFFFF):
            return f"\\u{ord(c):04x}"
        return "\\" + c
    if isinstance(x, str):
        if x.startswith(":") and len(x) > 1 and not _needs_quoting(x[1:]):
            return x  # keyword
        return '"' + x.replace("\\", "\\\\").replace('"', '\\"').replace(
            "\n", "\\n"
        ).replace("\t", "\\t").replace("\r", "\\r") + '"'
    if isinstance(x, bool):  # pragma: no cover — caught above
        return "true" if x else "false"
    if isinstance(x, (BigInt, BigInteger)):
        return f"{int(x)}N"
    if isinstance(x, int):
        return str(x)
    if isinstance(x, float):
        return repr(x)
    if isinstance(x, Decimal):
        return f"{x}M"
    if isinstance(x, dt.datetime):
        iso = x.isoformat()
        if x.tzinfo is None:
            iso += "Z"  # EDN #inst is RFC-3339; naive = UTC here
        return f'#inst "{iso}"'
    if isinstance(x, dt.date):
        return f'#inst "{x.isoformat()}T00:00:00Z"'
    if isinstance(x, dict):
        return "{" + ", ".join(
            f"{dumps(k)} {dumps(v)}" for k, v in x.items()
        ) + "}"
    if isinstance(x, (set, frozenset)):
        return "#{" + " ".join(sorted(dumps(v) for v in x)) + "}"
    if isinstance(x, (list, tuple)):
        return "[" + " ".join(dumps(v) for v in x) + "]"
    return dumps(str(x))  # last resort, mirrors the JSON path's default=str


# \w (unicode) admits the reference printer's non-ASCII keyword chars
# (:héllo prints bare); whitespace/braces/quotes stay excluded by \w
_KW_OK = re.compile(r"^[\w*+!\-?$%&=<>./#:]+$")


def _needs_quoting(name: str) -> bool:
    return not _KW_OK.match(name)


# ---------------------------------------------------------------------------
# reader

_TOKEN = re.compile(
    r"""
    (?P<ws>[\s,]+)
  | (?P<discard>\#_)
  | (?P<set>\#\{)
  | (?P<tag>\#[A-Za-z][A-Za-z0-9./\-]*)
  | (?P<open>[\[\(\{])
  | (?P<close>[\]\)\}])
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<char>\\(?:newline|space|tab|return|formfeed|backspace
                 |u[0-9a-fA-F]{4}|\S))
  | (?P<number>[+-]?(?:\d+/\d+
                    |\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?
                    |\d+(?:[eE][+-]?\d+)?)[MN]?)
  | (?P<kw_sym>[^\s,\[\]\(\)\{\}"\\]+)
    """,
    re.VERBOSE,
)

_STR_ESC = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}


def _tokens(s: str):
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if m is None:
            raise ValueError(f"bad EDN at offset {pos}: {s[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        yield kind, m.group()


def loads(s: str):
    toks = list(_tokens(s))
    val, rest = _read(toks, 0)
    if rest != len(toks):
        raise ValueError("trailing EDN content")
    return val


def _read(toks, i):
    if i >= len(toks):
        raise ValueError("unexpected end of EDN")
    kind, text = toks[i]
    if kind == "discard":
        _, j = _read(toks, i + 1)  # read and drop the next form
        return _read(toks, j)
    if kind == "string":
        return _unescape(text[1:-1]), i + 1
    if kind == "char":
        return _char(text[1:]), i + 1
    if kind == "number":
        return _number(text), i + 1
    if kind == "kw_sym":
        return _atom(text), i + 1
    if kind == "set":
        items, j = _read_seq(toks, i + 1, "}")
        return set(items), j
    if kind == "open":
        closer = {"[": "]", "(": ")", "{": "}"}[text]
        items, j = _read_seq(toks, i + 1, closer)
        if text == "{":
            if len(items) % 2:
                raise ValueError("EDN map with odd number of forms")
            return dict(zip(items[0::2], items[1::2])), j
        return list(items), j
    if kind == "tag":
        val, j = _read(toks, i + 1)
        return _tagged(text[1:], val), j
    raise ValueError(f"unexpected EDN token {text!r}")


def _read_seq(toks, i, closer):
    items = []
    while True:
        if i >= len(toks):
            raise ValueError(f"unterminated EDN collection, expected {closer}")
        kind, text = toks[i]
        if kind == "close":
            if text != closer:
                raise ValueError(f"mismatched {text!r}, expected {closer!r}")
            return items, i + 1
        val, i = _read(toks, i)
        items.append(val)


def _unescape(body: str) -> str:
    out, i = [], 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            out.append(_STR_ESC.get(body[i + 1], body[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _char(body: str) -> Char:
    if body in _NAMED_CHARS:
        return Char(_NAMED_CHARS[body])
    if len(body) == 5 and body[0] == "u":
        return Char(chr(int(body[1:], 16)))
    return Char(body)


def _number(text: str):
    if "/" in text:
        # ratio read as double (the engine's numeric layer coerces
        # anyway; the JSON surface has no ratio type either)
        num, den = text.split("/")
        return float(num) / float(den)
    if text.endswith("M"):
        return Decimal(text[:-1])
    if text.endswith("N"):
        return BigInt(text[:-1])
    if any(c in text for c in ".eE"):
        return float(text)
    return int(text)


def _atom(text: str):
    if text == "nil":
        return None
    if text == "true":
        return True
    if text == "false":
        return False
    return text  # keyword (":x") or symbol — both map to str


def _tagged(tag: str, val):
    if tag == "inst":
        iso = val.replace("Z", "+00:00")
        out = dt.datetime.fromisoformat(iso)
        if out.tzinfo is not None:
            out = out.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return out
    if tag == "uuid":
        return val
    raise ValueError(f"unsupported EDN tag #{tag}")


def unkeyword_keys(x):
    """Recursively turn map KEYS ':k' -> 'k' (EDN request envelopes use
    keyword keys — {:query {:find ...}} — while the engine's dict specs
    use plain-string keys; values keep their ':' so attributes survive)."""
    if isinstance(x, dict):
        return {
            (k[1:] if isinstance(k, str) and k.startswith(":") else k):
                unkeyword_keys(v)
            for k, v in x.items()
        }
    if isinstance(x, list):
        return [unkeyword_keys(v) for v in x]
    return x
