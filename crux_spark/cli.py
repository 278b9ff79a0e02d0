"""Command-line entry point — the reference's crux.main / crux.cli
(crux-core/src/crux/main.clj, cli.clj): parse node options from a
config file or inline args, start a node with the HTTP facade, run
until interrupted.

The reference accepts EDN or JSON configs with the precedence
CLI-supplied file > ./crux.edn > ./crux.json > classpath resource
(cli.clj:35-50, cli_test.clj test-config-merging). EDN is
Clojure-specific; this facade speaks the shared JSON subset, so the
precedence here is CLI file (-f) > ./crux_spark.json > inline (-j)
layered on top — inline options override file options key-by-key, the
same merge the reference applies to its [file json edn] vector.

Config keys (all optional):
    {"schema": "id string, name string",    # Node document schema
     "cpus": 8, "shuffle_partitions": 8,    # session sizing
     "http": {"port": 3000}}                # facade bind port

Usage: python -m crux_spark [-f conf.json] [-j '{"http":{"port":0}}']
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def parse_args(argv: list[str]) -> dict:
    """Resolve the effective node options: CLI file > ./crux_spark.json,
    then inline -j overrides layered key-by-key (dicts merge one level
    deep, the reference's opts-vector merge)."""
    p = argparse.ArgumentParser(
        prog="crux_spark",
        description="Start a crux_spark node with the HTTP facade",
    )
    p.add_argument(
        "-f", "--file",
        help="JSON config file (precedence over ./crux_spark.json)",
    )
    p.add_argument("-j", "--json", help="inline JSON options (override file)")
    p.add_argument(
        "--port", type=int, default=None,
        help="HTTP port shortcut (overrides config)",
    )
    args = p.parse_args(argv)

    opts: dict = {}
    path = args.file
    if path is None and os.path.exists("crux_spark.json"):
        path = "crux_spark.json"
    if path is not None:
        if not os.path.exists(path):
            raise SystemExit(f"Config file doesn't exist: {path}")
        if not path.endswith(".json"):
            raise SystemExit("Config file must be .json")
        with open(path) as f:
            opts = json.load(f)
    if args.json:
        inline = json.loads(args.json)
        for k, v in inline.items():
            if isinstance(v, dict) and isinstance(opts.get(k), dict):
                opts[k] = {**opts[k], **v}
            else:
                opts[k] = v
    if args.port is not None:
        opts.setdefault("http", {})["port"] = args.port
    return opts


def start_node(opts: dict):
    """Build (spark, node, http) from resolved options — the
    start-node-from-command-line body, minus the blocking loop."""
    from crux_spark import get_spark
    from crux_spark.http import HttpNode
    from crux_spark.node import Node

    spark = get_spark(
        "crux-spark-cli",
        cpus=int(opts.get("cpus", 8)),
        shuffle_partitions=int(opts.get("shuffle_partitions", 8)),
    )
    node = Node(spark, schema=opts.get("schema"))
    registry = None
    if opts.get("metrics", {}).get("enabled", True):
        # the reference's node topology wires crux-metrics by default
        # (index-store + query listeners); the facade then serves the
        # Prometheus scrape at GET /metrics (prometheus.clj
        # ->http-exporter, same port as the HTTP API here)
        from crux_spark.metrics import MetricsRegistry, assign_node_metrics

        registry = MetricsRegistry()
        assign_node_metrics(registry, node)
    http = HttpNode(
        node,
        port=int(opts.get("http", {}).get("port", 3000)),
        metrics_registry=registry,
    )
    return spark, node, http


def main(argv: list[str] | None = None) -> int:
    opts = parse_args(sys.argv[1:] if argv is None else argv)
    spark, node, http = start_node(opts)
    print(f"crux_spark node started; HTTP facade at {http.url}")
    try:
        import time

        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        http.close()
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
