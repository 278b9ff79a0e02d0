"""Honest-measurement invariants for the bench harness (NOTES_r5: the
r4 record timed `count()` plans that pruned the metric expressions —
text_repetition reported 0.28s for a query whose real collect() cost
11s and hid an O(tokens^2) bug). These tests pin the protocol so a
refactor can't silently reintroduce the trap."""

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def _agg_query(spark, sf_dir):
    from pyspark.sql import functions as F

    from crux_spark.queries import catalog_for

    li = catalog_for(spark, sf_dir).table("lineitem")
    # a computed projection + aggregate: exactly the node shapes count()
    # would prune away
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "rev"
        )
    )


def test_timed_run_fingerprints_executed_collect_plan(spark):
    """_timed_run must execute the frame's OWN QueryExecution (collect),
    so the fingerprint shows the finalized adaptive plan WITH the
    query's aggregate. A count()-based refactor leaves the frame's plan
    un-executed: isFinalPlan stays false and this fails."""
    sf = "/root/testdata/sf0.001"
    dt, df, n = bench._timed_run(_agg_query, spark, sf)
    assert n > 0 and dt > 0
    fp = bench._fingerprint(df)
    assert fp is not None
    assert fp["aqe_final"] is True  # the collected plan, not a derived one
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "HashAggregate" in final  # the aggregate wasn't pruned
    assert "rev" in final  # nor the computed projection


def test_count_plan_would_fail_the_invariant(spark):
    """Documents the trap itself: after df.count() the frame's own plan
    has NOT run — the invariant check above is what catches it."""
    sf = "/root/testdata/sf0.001"
    df = _agg_query(spark, sf)
    df.count()  # derived plan runs; df's QueryExecution does not
    fp = bench._fingerprint(df)
    assert fp["aqe_final"] is False


def test_final_record_line_is_compact_and_parseable():
    """The r5 regression: plans+storage pushed the one-line record past
    the driver's ~2 KB tail capture (BENCH_r05.json parsed:null). The
    compact line now carries per-query detail only for the 50-gate
    correctness window (the full map lives in BENCH_PLANS.json), so its
    size is FIXED as the registry grows: the window record must stay
    under the guard threshold no matter how many gates register."""
    from crux_spark.queries import QUERIES

    names = list(QUERIES)
    record = {
        "metric": "suite_total_wall",
        "value": 99.999,
        "unit": "sec",
        "queries": {name: 99.99 for name in names[:50]},
        "sf": 0.1,
        "tpch_total": 99.999,
        "n_queries": len(names),
    }
    line = json.dumps(record)
    assert len(line) <= 1900, (
        f"{len(line)} bytes: the compact bench record no longer fits the "
        "driver's tail window — trim gate names or move detail to "
        "BENCH_PLANS.json"
    )
    assert json.loads(line)["queries"]
    # every correctness-window gate name is present in the compact line
    assert set(json.loads(line)["queries"]) == set(names[:50])
