from crux_spark.sources.loaders import read_csv_documents, read_ntriples, triples_view

__all__ = ["read_ntriples", "read_csv_documents", "triples_view"]
