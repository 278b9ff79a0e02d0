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
