from elasticsearch_alps_spark.merging.merger import merge_indexes  # noqa: F401
