"""Port of crux-test/test/crux/logging_test.clj: document VALUES must
never reach log output — the engine may log operational messages around
put/match/delete/evict/query, but a secret stored in a document (or
passed as a query arg) must not appear in any of them.

The reference redefines log* to capture every message across the node
fixture; here a root-logger handler plus warnings-capture plays that
role around the same op sequence (put, re-put, match, delete, evict,
:in-arg query, value query)."""

import logging
import warnings

import pytest

from crux_spark.node import Node

SECRET = 33489857205


class _Capture(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.messages: list[str] = []

    def emit(self, record):
        try:
            self.messages.append(record.getMessage())
        except Exception:
            self.messages.append(str(record.msg))


@pytest.fixture()
def capture():
    h = _Capture()
    root = logging.getLogger()
    old_level = root.level
    # py4j's DEBUG level dumps every JVM call's wire payload by design
    # (a transport sniffer, the analogue of logging raw KV traffic) —
    # the reference's contract covers the ENGINE's log seam, so py4j
    # stays at its INFO+ operational level while everything else is
    # captured down to DEBUG
    py4j_logger = logging.getLogger("py4j")
    old_py4j = py4j_logger.level
    py4j_logger.setLevel(logging.INFO)
    root.addHandler(h)
    root.setLevel(logging.DEBUG)
    try:
        with warnings.catch_warnings(record=True) as ws:
            warnings.simplefilter("always")
            yield h, ws
    finally:
        root.removeHandler(h)
        root.setLevel(old_level)
        py4j_logger.setLevel(old_py4j)


def _assert_no_secrets(h, ws):
    needle = str(SECRET)
    for m in h.messages:
        assert needle not in m, f"secret leaked to log: {m!r}"
    for w in ws:
        assert needle not in str(w.message), f"secret leaked to warning: {w}"


def test_no_logged_secrets(spark, capture):
    h, ws = capture
    node = Node(spark, schema="id string, secret long, secret_2 long")
    # put / re-put / match / delete / evict (logging_test.clj ops)
    node.submit_tx([("put", {"id": "secure-document", "secret": SECRET})])
    node.submit_tx([("put", {"id": "secure-document", "secret_2": SECRET})])
    node.submit_tx([
        ("match", "secure-document",
         {"id": "secure-document", "secret_2": SECRET}),
        ("put", {"id": "secure-document", "secret": SECRET}),
    ])
    node.await_tx()
    # query with :in arg carrying the secret + value query
    node.db().q_collect(
        {"find": ["?s"], "in": ["?ss"],
         "where": [["?e", ":secret", "?s"], ["?e", ":secret", "?ss"]]},
        SECRET,
    )
    node.db().q_collect(
        {"find": ["?s"], "where": [["?e", ":secret", "?s"]]}
    )
    node.submit_tx([("delete", "secure-document")])
    node.submit_tx([("evict", "secure-document")])
    node.await_tx()
    _assert_no_secrets(h, ws)


def test_failed_query_error_does_not_leak_args(spark, capture):
    """A failing query's recorded error/state must not embed :in arg
    values either (the monitored-query queues keep the query map, whose
    args a deployment may display — the reference's log contract extends
    to anything the engine itself emits)."""
    h, ws = capture
    node = Node(spark, schema="id string, secret long")
    node.submit_tx([("put", {"id": "d", "secret": SECRET})])
    node.await_tx()
    with pytest.raises(Exception):
        node.db().q_collect(
            {"find": ["?unbound"], "in": ["?ss"],
             "where": [["?e", ":secret", "?s"]]},
            SECRET,
        )
    _assert_no_secrets(h, ws)
