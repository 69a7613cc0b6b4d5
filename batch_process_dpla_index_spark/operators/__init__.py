from batch_process_dpla_index_spark.operators import (
    dedup,
    grouped,
    multimodal,
    relational,
    similarity,
)

__all__ = ["dedup", "grouped", "multimodal", "relational", "similarity"]
