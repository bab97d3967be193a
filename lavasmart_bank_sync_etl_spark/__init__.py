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

# Query-registry population: importing these modules registers every
# driver-facing query in queries.QUERIES/ORACLES. They are imported
# HERE (not at the bottom of queries.py) because the package __init__
# always completes a submodule import before the requesting module
# resumes — so entering the package through any query module (e.g.
# `import lavasmart_bank_sync_etl_spark.queries_llm`) can never
# observe a partially-initialized sibling.
from . import queries  # noqa: E402,F401
from . import queries_merge  # noqa: E402,F401
from . import queries_llm  # noqa: E402,F401
from . import queries_pipeline  # noqa: E402,F401
from . import queries_warehouse  # noqa: E402,F401
from . import queries_curation  # noqa: E402,F401
from . import queries_quality  # noqa: E402,F401
from . import queries_workbook  # noqa: E402,F401  (needs queries_llm/_pipeline)
