"""Metrics registry + node listeners + reporters — the crux-metrics
surface (crux-test/test/crux/metrics_test.clj ported: index-store and
query metric lifecycles around a real ingest + query)."""

import io

import pytest

from crux_spark.metrics import (
    CallbackReporter,
    ConsoleReporter,
    CsvReporter,
    MetricsRegistry,
    assign_node_metrics,
)
from crux_spark.node import Node


@pytest.fixture()
def node(spark):
    return Node(spark, schema="id string, name string, score long")


def test_index_store_metrics(node):
    """metrics_test.clj test-index-store-metrics: meters zero before
    ingest, counted after; tx-id-lag settles to zero; tx-latency gauge
    is positive once then resets on read."""
    reg = MetricsRegistry()
    mets = assign_node_metrics(reg, node)
    assert reg.gauges["index-store.tx-id-lag"]() is None
    assert mets["docs_ingested_meter"].count == 0
    assert mets["txs_indexed_meter"].count == 0

    node.submit_tx([("put", {"id": "t1", "name": "Ivan", "score": 1})])
    node.await_tx()

    assert mets["docs_ingested_meter"].count == 1
    assert mets["txs_indexed_meter"].count == 1
    assert mets["avs_ingested_meter"].count == 3  # id + name + score
    assert reg.gauges["index-store.tx-id-lag"]() == 0
    lat = reg.gauges["index-store.tx-latency"]()
    assert lat > 0
    assert reg.gauges["index-store.tx-latency"]() == 0  # reset-on-read


def test_query_metrics(node):
    """metrics_test.clj test-query-metrics: the query timer counts both
    completed and failed queries; currently-running drains to zero."""
    reg = MetricsRegistry()
    mets = assign_node_metrics(reg, node)
    assert mets["query_timer"].count == 0

    node.submit_tx([("put", {"id": "t1", "name": "Ivan", "score": 1})])
    node.await_tx()
    rows = node.db().q_collect(
        {"find": ["?e"], "where": [["?e", ":name", "Ivan"]]}
    )
    assert rows == [("t1",)]
    with pytest.raises(Exception):
        node.db().q_collect(
            {"find": ["?f"], "where": [["?e", ":name", "Ivan"]]}
        )
    assert mets["query_timer"].count == 2
    assert mets["query_timer"].total > 0
    assert reg.gauges["query.currently-running"]() == 0


def test_reporters(node, tmp_path):
    reg = MetricsRegistry()
    assign_node_metrics(reg, node)
    node.submit_tx([("put", {"id": "t1", "name": "Ivan", "score": 1})])
    node.await_tx()

    buf = io.StringIO()
    snap = ConsoleReporter(reg, stream=buf).report()
    text = buf.getvalue()
    assert "index-store.indexed-docs.count" in text
    assert snap["index-store.indexed-docs.count"] == 1

    d = str(tmp_path / "metrics")
    csvr = CsvReporter(reg, d)
    csvr.report()
    csvr.report()
    rows = open(f"{d}/index-store.indexed-txs.count.csv").read().splitlines()
    assert rows[0] == "t,value" and len(rows) == 3

    seen = []
    CallbackReporter(reg, seen.append).report()
    assert seen and seen[0]["index-store.indexed-txs.count"] == 1

    # scheduled mode: background thread reports at frequency, final
    # flush on close
    seen2 = []
    rep = CallbackReporter(reg, seen2.append, report_frequency=0.05).start()
    import time

    time.sleep(0.2)
    rep.close()
    assert len(seen2) >= 2


def test_broken_gauge_does_not_kill_report():
    reg = MetricsRegistry()
    reg.gauge("bad", lambda: 1 / 0)
    reg.meter("ok").mark(2)
    snap = reg.snapshot()
    assert snap["ok.count"] == 2
    assert "error" in str(snap["bad"])
