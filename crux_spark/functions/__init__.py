from crux_spark.functions.text_search import build_text_index, text_search
from crux_spark.functions import multi_field  # registers lucene-text-search

__all__ = ["build_text_index", "text_search", "multi_field"]
