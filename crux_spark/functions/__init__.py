from crux_spark.functions.text_search import build_text_index, text_search

__all__ = ["build_text_index", "text_search"]
