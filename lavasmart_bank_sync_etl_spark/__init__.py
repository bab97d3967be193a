"""lavasmart_bank_sync_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query/data-processing
capabilities of the reference ETL (UlisesdelaO/lavasmart-bank-sync-etl):
an incremental, keyed upsert/merge batch pipeline with CDC audit output
(see SURVEY.md), plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Design tenets (SURVEY.md §7):
- Declarative DataFrame/SQL plans; Catalyst/AQE does the physical work.
- Zero row-at-a-time Python UDFs in the core; Arrow-batched pandas UDFs
  only where built-ins genuinely cannot express the semantics.
- Every operator written for 100 TB scale: partition pruning, broadcast
  of dimensions, map-side partial aggregation, no driver-side collects.
"""

__version__ = "0.1.0"
