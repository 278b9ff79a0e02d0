"""Property-based round-trip coverage for the EDN codec (crux_spark/edn.py
— the HTTP content-negotiation wire format): loads(dumps(x)) == x over
randomly-nested values of every supported type, plus reader edge cases
the example tests in test_http_api.py don't reach."""

import datetime as dt
from decimal import Decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from crux_spark import edn

scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=40),
    # keyword-shaped strings (print unquoted, must still round-trip)
    st.from_regex(r":[A-Za-z][A-Za-z0-9*+!\-_?$%&=<>./]{0,15}", fullmatch=True),
    st.decimals(allow_nan=False, allow_infinity=False),
    st.datetimes(
        min_value=dt.datetime(1, 1, 1),
        max_value=dt.datetime(9999, 12, 28),
    ),
)

values = st.recursive(
    scalars,
    lambda kids: st.one_of(
        st.lists(kids, max_size=5),
        st.dictionaries(st.text(max_size=10), kids, max_size=4),
        st.sets(
            st.one_of(st.integers(), st.text(max_size=10), st.booleans()),
            max_size=5,
        ),
    ),
    max_leaves=20,
)


@settings(max_examples=300, deadline=None)
@given(values)
def test_edn_round_trip(x):
    assert edn.loads(edn.dumps(x)) == x


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_edn_string_round_trip(s):
    """Arbitrary text — including strings that LOOK like keywords,
    numbers, nil, braces, #_, or contain escapes — survives."""
    assert edn.loads(edn.dumps(s)) == s


@settings(max_examples=100, deadline=None)
@given(st.decimals(allow_nan=False, allow_infinity=False))
def test_edn_decimal_round_trip(d):
    out = edn.loads(edn.dumps(d))
    assert isinstance(out, Decimal) and out == d


def test_edn_reader_errors():
    for bad in ["", "[1 2", "{:a}", "(]", "#wat 1", '"unterminated']:
        with pytest.raises(ValueError):
            edn.loads(bad)
    with pytest.raises(ValueError):
        edn.loads("[1] [2]")  # trailing content


def test_edn_whitespace_and_comments_equivalents():
    # commas are whitespace; #_ discards nested forms
    assert edn.loads("[1,,,2  ,3]") == [1, 2, 3]
    assert edn.loads("#_ [1 #_ 2 3] {:a 1}") == {":a": 1}
    assert edn.loads("#_#_ 1 2 3") == 3  # stacked discards


# ---------------------------------------------------------------------------
# r11 verdict #8: reference-grammar edge cases — nested tagged literals,
# ratios-as-doubles, non-ASCII keywords, chars, bigints (codec_test.clj
# breadth over the wire format)
# ---------------------------------------------------------------------------

from crux_spark.valuetypes import BigInt, Char  # noqa: E402

_kw_non_ascii = st.from_regex(
    r":[A-Za-zÀ-öø-ÿΑ-ωа-я][\wÀ-öø-ÿΑ-ωа-я*+!\-?$%&=<>./]{0,12}",
    fullmatch=True,
)

extended_scalars = st.one_of(
    scalars,
    _kw_non_ascii,
    st.builds(Char, st.characters(blacklist_categories=("Cs",))),
    st.builds(BigInt, st.integers(min_value=-(10**40), max_value=10**40)),
)

extended_values = st.recursive(
    extended_scalars,
    lambda kids: st.one_of(
        st.lists(kids, max_size=4),
        st.dictionaries(
            st.one_of(st.text(max_size=8), _kw_non_ascii), kids, max_size=3
        ),
    ),
    max_leaves=15,
)


@settings(max_examples=300, deadline=None)
@given(extended_values)
def test_edn_extended_round_trip(x):
    """Chars, bigints, and non-ASCII keywords round-trip — nested
    arbitrarily inside vectors/maps (tagged literals like #inst already
    ride the same recursion and are covered by `values`)."""
    out = edn.loads(edn.dumps(x))
    assert out == x
    _assert_same_classes(out, x)


def _assert_same_classes(out, x):
    """== alone can't distinguish Char('m') from 'm' or BigInt(7) from
    7 — the codec classes must SURVIVE the round trip, not merely
    compare equal."""
    if isinstance(x, Char):
        assert isinstance(out, Char), (out, x)
    elif isinstance(x, BigInt):
        assert isinstance(out, BigInt), (out, x)
    elif isinstance(x, list):
        for o, i in zip(out, x):
            _assert_same_classes(o, i)
    elif isinstance(x, dict):
        for k in x:
            _assert_same_classes(out[k], x[k])


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=-(10**6), max_value=10**6),
    st.integers(min_value=1, max_value=10**6),
)
def test_edn_ratio_reads_as_double(num, den):
    """Clojure ratio literals (1/3) read as doubles — the engine's
    numeric layer coerces ratios numerically anyway."""
    import math

    got = edn.loads(f"{num}/{den}")
    assert isinstance(got, float)
    assert math.isclose(got, num / den, rel_tol=1e-12)


def test_edn_nested_tagged_literals():
    """#inst nested inside collections, under discards, and as map
    values — the tag applies to the immediately following form at any
    depth (codec_test.clj exercises instants in every position)."""
    i = dt.datetime(2024, 5, 1, 12, 30)
    nested = {":a": [i, {":b": i}], ":c": {i}}
    assert edn.loads(edn.dumps(nested)) == nested
    # a discarded tagged form disappears entirely
    assert edn.loads('[#_ #inst "2020-01-01T00:00:00Z" 1]') == [1]
    # tag directly inside a set
    assert edn.loads('#{#inst "2024-05-01T12:30:00Z"}') == {i}


def test_edn_char_literals():
    assert edn.loads(r"\a") == Char("a")
    assert edn.loads(r"\newline") == Char("\n")
    assert edn.loads(r"\space") == Char(" ")
    assert isinstance(edn.loads("\\é"), Char)  # non-ASCII char literal
    got = edn.loads(r"[\a \b]")
    assert got == [Char("a"), Char("b")]
    assert all(isinstance(c, Char) for c in got)  # class, not just ==
    assert edn.dumps(Char("\t")) == r"\tab"
    assert edn.dumps(Char("z")) == r"\z"
    # round-trip keeps the class, not just equality
    assert isinstance(edn.loads(edn.dumps(Char("q"))), Char)


def test_edn_bigint_literals():
    big = BigInt(12345678901234567890123456789)
    assert edn.dumps(big) == "12345678901234567890123456789N"
    out = edn.loads(edn.dumps(big))
    assert out == big and isinstance(out, BigInt)
    # plain ints still read as plain ints
    assert type(edn.loads("42")) is int


def test_edn_non_ascii_keyword_prints_bare():
    assert edn.dumps(":héllo") == ":héllo"
    assert edn.loads(":héllo") == ":héllo"
    assert edn.loads(edn.dumps({":ключ": 1})) == {":ключ": 1}
