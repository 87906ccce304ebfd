"""Reusable Spark pandas UDFs over the reference-parity tokenizer.

NOTE: deliberately NO `from __future__ import annotations` here —
pandas_udf infers the eval type from real (non-stringified) type hints.
"""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType


@F.pandas_udf(ArrayType(StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Full reference-parity tokenization (lower -> lex -> stem -> stop)."""
    from indexer_spark.lexer import tokenize

    return texts.map(tokenize)


@F.pandas_udf(IntegerType())
def n_index_terms_udf(texts: pd.Series) -> pd.Series:
    """Number of index terms per text (post stop-filter token count)."""
    from indexer_spark.lexer import tokenize

    return texts.map(lambda t: len(tokenize(t)))
