"""Port of the reference's CLI config handling
(crux-core/test/crux/cli_test.clj test-config-merging, adapted to the
JSON-only facade): CLI-supplied file wins over ./crux_spark.json in the
cwd, inline -j options layer key-by-key on top of the file, --port is
an override shortcut, and error cases (missing file, wrong extension)
exit with a message. Plus an end-to-end serve check: start_node brings
up the HTTP facade and /_crux/status answers."""

import json
import os

import pytest

from crux_spark.cli import parse_args, start_node


def test_config_merging(tmp_path, monkeypatch):
    conf = tmp_path / "conf.json"
    conf.write_text(json.dumps({"schema": "id string", "http": {"port": 1}}))
    cwd_conf = tmp_path / "crux_spark.json"
    cwd_conf.write_text(json.dumps({"schema": "id string, x long"}))
    monkeypatch.chdir(tmp_path)

    # CLI-supplied file wins over the cwd default
    assert parse_args(["-f", str(conf)])["schema"] == "id string"
    # cwd crux_spark.json used when no -f
    assert parse_args([])["schema"] == "id string, x long"
    # inline -j layers key-by-key over the file (nested dicts merge)
    got = parse_args(["-f", str(conf), "-j", '{"http": {"port": 7}}'])
    assert got["http"] == {"port": 7} and got["schema"] == "id string"
    # --port shortcut overrides everything
    assert parse_args(["-f", str(conf), "--port", "0"])["http"]["port"] == 0


def test_config_errors(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit, match="doesn't exist"):
        parse_args(["-f", str(tmp_path / "nope.json")])
    bad = tmp_path / "conf.edn"
    bad.write_text("{}")
    with pytest.raises(SystemExit, match="must be .json"):
        parse_args(["-f", str(bad)])


def test_start_node_serves_http(spark, tmp_path, monkeypatch):
    """start-node-from-command-line minus the blocking loop: the facade
    comes up and answers /_crux/status; reuse the test session instead
    of letting start_node build one (get_spark returns the active
    session, so this is the same code path)."""
    import urllib.request

    monkeypatch.chdir(tmp_path)
    _, node, http = start_node({"schema": "id string, name string",
                                "http": {"port": 0}})
    try:
        with urllib.request.urlopen(http.url + "/_crux/status") as r:
            status = json.loads(r.read())
        assert "crux.version/version" in json.dumps(status) or status
        # r10: the CLI node wires metrics by default; the facade serves
        # the Prometheus scrape (prometheus.clj ->http-exporter)
        node.submit_tx([("put", {"id": "m1", "name": "x"})])
        node.await_tx()
        with urllib.request.urlopen(http.url + "/metrics") as r:
            body = r.read().decode()
        assert "crux_index_store_indexed_txs_total 1" in body
    finally:
        http.close()

    # metrics can be disabled via config, like omitting the module from
    # the reference topology
    _, node2, http2 = start_node({"schema": "id string, name string",
                                  "http": {"port": 0},
                                  "metrics": {"enabled": False}})
    try:
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(http2.url + "/metrics")
        assert ei.value.code == 404
    finally:
        http2.close()
