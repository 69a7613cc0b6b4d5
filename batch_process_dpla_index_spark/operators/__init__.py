from batch_process_dpla_index_spark.operators import dedup, relational, similarity

__all__ = ["dedup", "relational", "similarity"]
