"""Plan inspection helpers — the feedback loop for Catalyst-aware work.

`plan_facts(df)` extracts the facts that matter when checking an
operator's physical plan: which tables were scanned with which columns
(pruning), what reached the parquet reader (pushdown), join strategies,
and whether partition filters pinned directories.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, executed: bool = True) -> str:
    qe = df._jdf.queryExecution()
    return (qe.executedPlan() if executed else qe.sparkPlan()).toString()


def plan_facts(df: DataFrame) -> dict:
    plan = physical_plan(df)
    scans = re.findall(r"FileScan parquet \[([^\]]*)\].*?Location: [^\[]*\[([^\]]*)\]", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    partition_filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    return {
        "scans": [
            {"columns": cols.split(","), "path": path} for cols, path in scans
        ],
        "pushed_filters": pushed,
        "partition_filters": [p for p in partition_filters if p.strip()],
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "shuffle_exchanges": plan.count("Exchange hashpartitioning"),
        # checkpointed-subtree reads: a shared base relation (or-join /
        # not-join branches, compile.py) materializes ONCE and re-reads as
        # an in-memory RDD scan — at 100 TB that's a cached columnar read
        # instead of a repeated parquet scan of the base join
        "checkpoint_reads": plan.count("Scan ExistingRDD"),
    }
