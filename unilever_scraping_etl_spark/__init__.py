"""unilever_scraping_etl_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference repo ``willyyeremi/unilever-scraping-etl``
(an Airflow scrape→parse→load ETL pipeline), re-expressed Spark-first:

- the scrape dataflow becomes one lazy DataFrame plan (seed shops →
  page explode → Arrow-batched fetch/extract UDFs → validity split →
  partitioned sink), see ``sources/``;
- the scalar parsing semantics (Rupiah, percent, date stamping) become
  JVM-side column expressions, see ``functions/``;
- full relational analytics over the loaded snapshot table (joins,
  window functions, rollups, set ops), see ``operators/``;
- LLM-data-pipeline extensions (dedup, similarity search, text
  analysis, multimodal plumbing) designed for 100 TB scale, see
  ``operators/dedup.py``, ``operators/similarity.py``,
  ``functions/text.py``;
- incremental/streaming surface over event streams, see ``streaming/``.

No code is copied from the reference; semantics are cited by
``file:line`` in docstrings for parity checking.
"""

__version__ = "0.1.0"
