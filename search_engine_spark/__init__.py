"""search_engine_spark — a PySpark-native full-text inverted-index + BM25 engine.

A from-scratch Spark rebuild of the capabilities of the reference engine
(CMU 11-642 "QryEval", Java + Lucene — see SURVEY.md): inverted-index build,
BM25 / Indri / Boolean retrieval models, structured query operators
(#AND #OR #SUM #SYN #NEAR/n #WINDOW/n #WAND #WSUM), TREC-style top-k output,
plus large-scale training-data pipeline operators (dedup, similarity search,
text analysis).

Everything is expressed DataFrame-first so Catalyst/Tungsten plan the
physical execution; Python touches data only through Arrow-vectorized
pandas UDFs (positional operators, tokenizer variant) — never per-row.
"""

__version__ = "0.1.0"
