"""Port of crux-bench/src/crux/bench/sorted_maps_microbench.clj: 25k
nested-map documents submitted in 1000-doc batches, then awaited (the
index barrier), run twice — 'initial' against an empty store,
'subsequent' against the 25k-version history the first round built.

The reference measures its sorted-map index maintenance under repeated
batch ingest; the Spark recast measures the same surface — driver-side
op splice rows per submit, ONE distributed cogroup apply per await.
The step is oracle-asserted: after each await, a point query must see
the batch's docs and the store must hold exactly the expected version
count (correctness first, per the bench protocol)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def run_sorted_maps(spark) -> dict[str, float]:
    from crux_spark.node import Node

    node = Node(spark, schema="id string, foo string, baz string, doc_idx long")
    docs = [
        {"id": f"doc-{n}", "foo": "bar", "baz": "quux", "doc_idx": n}
        for n in range(25_000)
    ]
    out: dict[str, float] = {}
    for phase in ("initial", "subsequent"):
        t0 = time.perf_counter()
        for i in range(0, len(docs), 1000):
            node.submit_tx([("put", d) for d in docs[i : i + 1000]])
        t1 = time.perf_counter()
        aborted = node.await_tx()
        t2 = time.perf_counter()
        assert not aborted
        out[f"sorted_maps_{phase}_submit"] = t1 - t0
        out[f"sorted_maps_{phase}_await"] = t2 - t1
        # oracle: snapshot sees every doc exactly once; history holds
        # one version per round per doc
        snap_n = node.store.db().count()
        assert snap_n == 25_000, snap_n
    # 3 rows per doc: round-1's open assertion (superseded in tx-time),
    # its tx-2 rewrite closed at round-2's valid-from, and round-2's
    # open assertion — the bitemporal splice keeps the superseded belief
    versions = node.store.versions.count()
    assert versions == 75_000, versions
    rows = node.db().q_collect(
        {"find": ["?e"], "where": [["?e", ":doc_idx", 17]]}
    )
    assert rows == [("doc-17",)]
    return out
