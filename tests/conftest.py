import pytest
from pyspark.sql import SparkSession

from elasticsearch_alps_spark.config import IndexConfig
from elasticsearch_alps_spark.fixtures import generate_documents
from elasticsearch_alps_spark.indexing.builder import build_index
from elasticsearch_alps_spark.oracle import OracleIndex

N_DOCS = 300


@pytest.fixture(scope="session")
def spark():
    s = (SparkSession.builder
         .master("local[4]")
         .appName("elasticsearch_alps_spark-tests")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    s.sparkContext.setLogLevel("WARN")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    return generate_documents(N_DOCS, seed=42)


@pytest.fixture(scope="session")
def corpus_df(spark, corpus):
    return spark.createDataFrame(
        corpus, "repo string, path string, commit string, lang string, content string")


@pytest.fixture(scope="session")
def index_cfg():
    return IndexConfig()


@pytest.fixture(scope="session")
def built_index(spark, corpus_df, index_cfg, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index") / "idx")
    return build_index(spark, corpus_df, out, index_cfg, shards=4)


@pytest.fixture(scope="session")
def doc_id_map(spark, built_index):
    """(repo,path,commit) → engine-assigned dense doc_id."""
    rows = spark.read.parquet(built_index.docs).select(
        "repo", "path", "commit", "doc_id").collect()
    return {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in rows}


@pytest.fixture(scope="session")
def oracle_index(corpus, doc_id_map, index_cfg):
    """Oracle over the same raw docs with the engine's doc_ids."""
    docs = []
    for repo, path, commit, _lang, content in corpus:
        key = (repo, path, commit)
        if key in doc_id_map:
            docs.append((doc_id_map[key], content))
    # docs filtered by P1 exist in the map; oracle re-applies P1/truncation
    return OracleIndex(sorted(docs), index_cfg)
