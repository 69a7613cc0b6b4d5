"""batch_process_dpla_index_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query/data-processing
capabilities of the reference batch pipeline (dpla/batch-process-dpla-index,
Scala/Spark 3.5), extended with large-scale training-data operators
(dedup, similarity search, text analysis) designed for 100 TB scale.

Design stance (SURVEY.md §7): a thin, well-typed PySpark library — all
logic is declared through the DataFrame/Column API so Catalyst remains
the only optimizer. No custom plan rules; no row-at-a-time Python UDFs
on hot paths (Arrow/pandas UDFs only where built-ins cannot express the
semantics, e.g. vector math fallbacks and multimodal decode stubs).
"""

from batch_process_dpla_index_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
