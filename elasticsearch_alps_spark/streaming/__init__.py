from elasticsearch_alps_spark.streaming.incremental import IncrementalIndexer  # noqa: F401
