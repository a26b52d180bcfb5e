from elasticsearch_alps_spark.indexing.builder import build_index, IndexPaths  # noqa: F401
