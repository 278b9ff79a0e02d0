from crux_spark.streaming.ingest import TxLogStream, stream_rollup

__all__ = ["TxLogStream", "stream_rollup"]
