from horus_ner_spark.functions.tokenizer import (
    tokenize,
    tokenize_series,
    tokenize_udf_factory,
    STOPLISTS,
)

__all__ = ["tokenize", "tokenize_series", "tokenize_udf_factory", "STOPLISTS"]
