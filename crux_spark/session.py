"""SparkSession factory tuned for the engine.

Local-mode testing uses local[$SPARK_GRAFT_CPUS]; the configs are chosen to
also be sane defaults on a real cluster (AQE on, skew-join handling on,
UTC session timezone so timestamps hash-match a UTC-naive oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crux-spark",
    cpus: str | int | None = None,
    shuffle_partitions: str | int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    On a real cluster ``master`` comes from spark-submit; here we default to
    local[N]. Shuffle partitions default to the local core count — on a
    1000-executor cluster this should be set to ~2-3x total cores instead
    (AQE coalesces down, so oversizing is the safe direction).
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = str(shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # 16MB, not the old 64MB: a mid-size fact table (sf1 orders,
        # ~45MB estimated) statically broadcast pre-empts AQE's smarter
        # runtime decision — post-shuffle intermediates are measured
        # with REAL sizes and AQE still converts SMJ->BHJ when they are
        # small, so the r12 A/B showed 16MB strictly faster at both
        # sf0.1 (tpch 13.0s -> 9.3s) and sf1.0 (q5 26.7s -> 6.5s, q4
        # halved). At cluster scale a >16MB single-threaded broadcast
        # build is the wrong side anyway.
        .config("spark.sql.autoBroadcastJoinThreshold", "16MB")
        # the AQE-side threshold works on MEASURED post-shuffle sizes
        # (not Catalyst's static estimates), so it can afford to be
        # more aggressive: intermediates between 16 and 64MB still
        # convert to broadcast at runtime (sf1 TPC-H 38.9s -> 32.4s on
        # top of the static-16MB change)
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64MB")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        # parquet TIMESTAMP(NANOS) (e.g. events.ts) reads as long; the
        # Catalog converts it back to a microsecond timestamp column
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # clojure merge/assoc are right-wins on duplicate map keys
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
