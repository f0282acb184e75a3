"""kawa_spark — a PySpark-native entity-resolution / record-linkage engine.

From-scratch reimplementation of the capabilities of ontocord/kawa
(multilingual lexicon-driven mention extraction + normalization +
blocking + pairwise scoring + transitive clustering), architected for
Spark: DataFrame/Catalyst for the relational 80%, Arrow-vectorized
pandas UDFs for the algorithmic 20%.

Layout:
  lexicon/    pure-Python matcher core (oracle + executor-side), tags,
              stopwords, CJK handling, Spark lexicon ETL
  operators/  extraction, normalization, blocking, scoring, connected
              components, dedup, similarity search, text stats
  session.py  SparkSession factory (AQE, Arrow, tuned shuffles)
  pipeline.py end-to-end ER pipeline with stage checkpoints + resume
  testgen.py  deterministic synthetic corpus generator
"""

__version__ = "0.1.0"
