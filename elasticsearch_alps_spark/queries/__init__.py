from elasticsearch_alps_spark.queries.engine import SearchEngine  # noqa: F401
