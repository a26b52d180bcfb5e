from elasticsearch_alps_spark.analysis.analyzers import (  # noqa: F401
    analyze, analyze_positions, html_strip, ascii_fold, tokenize_standard,
)
from elasticsearch_alps_spark.analysis.stopwords import ENGLISH_STOP_WORDS  # noqa: F401
from elasticsearch_alps_spark.analysis.porter import porter_stem  # noqa: F401
from elasticsearch_alps_spark.analysis.smallfloat import (  # noqa: F401
    int_to_byte4, byte4_to_int, quantize_length,
)
