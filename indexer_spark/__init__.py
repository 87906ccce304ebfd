"""indexer_spark — a PySpark-native inverted-index build + BM25 query engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference full-text search engine (juanmilkah/indexer, surveyed in
SURVEY.md): tokenize -> postings build -> compress -> BM25 top-k, over an
Iceberg/Parquet table of multi-turn transcripts, designed for 10^12-turn
scale and verified at small scale against a literal single-process oracle.
"""

__version__ = "0.1.0"
