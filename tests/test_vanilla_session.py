"""Regression guard for the round-1 blocker: the correctness driver builds a
VANILLA SparkSession (no engine confs) and calls queries()[name](spark, sf).
Round 1, Catalog.__init__ eagerly read events.parquet (TIMESTAMP(NANOS)) and
died with PARQUET_TYPE_ILLEGAL on any session lacking
spark.sql.legacy.parquet.nanosAsLong — zeroing all 49 gates.

The engine must self-configure (Catalog.ensure_runtime_confs) and register
tables lazily so one bad file can't sink unrelated queries. Because confs
like nanosAsLong stick per-JVM once set, this test spawns a FRESH subprocess
that builds a bare session — same shape as the driver's harness.
"""

import pytest
import json
import subprocess
import sys
import textwrap

SCRIPT = textwrap.dedent(
    """
    import json
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("vanilla-gate-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    sf = "/root/testdata/sf0.001"
    out = {}
    # one query per subsystem: TPC-H/Datalog, events (the nanos table),
    # bitemporal store, dedup, embeddings
    for name in [
        "tpch_q1",
        "events_asof",
        "bitemporal_store_asof",
        "dedup_exact",
        "ann_brute_force",
    ]:
        df = qs[name](spark, sf)
        out[name] = df.count()
    # entry() itself is smoke-checked by the driver on a vanilla session too
    out["entry"] = entry.entry(spark).count()
    print("RESULT:" + json.dumps(out))
    """
)


@pytest.mark.full
def test_gates_run_on_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=600,
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-4000:]}"
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, f"no RESULT line in stdout:\n{proc.stdout[-2000:]}"
    counts = json.loads(line[0][len("RESULT:"):])
    assert counts["tpch_q1"] == 6
    assert counts["events_asof"] > 0
    assert counts["bitemporal_store_asof"] > 0
    assert counts["entry"] >= 0
