from crux_spark.bitemporal.snapshot import latest_as_of

__all__ = ["latest_as_of"]
