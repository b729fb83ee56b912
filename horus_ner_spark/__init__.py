"""horus_ner_spark — a PySpark-native full-text index + BM25 query engine.

A from-scratch engine with the query/data-processing capabilities of the
reference (SmartDataAnalytics/HORUS-NER): where the reference answers
``term -> top-k documents`` by calling an external search engine and caching
results in SQLite (reference: src/core/util/search_engines.py:27-63,
src/core/util/sqlite_helper.py:42-48), this engine builds the inverted index
itself over a corpus table and answers ``query -> BM25 top-k`` natively on
Spark DataFrames.

Layout
------
- ``functions/``  code-aware tokenizer + text-analysis scalar kernels
- ``index/``      codec, corpus stats, SPIMI build, BM25 query (brute force +
                  block-max WAND), checkpoint manifest
- ``ops/``        relational operator catalog (driver-oracle-checked)
- ``corpus.py``   deterministic synthetic source-code corpus generator
- ``session.py``  SparkSession factory with scale-appropriate configs
"""

__version__ = "0.1.0"
