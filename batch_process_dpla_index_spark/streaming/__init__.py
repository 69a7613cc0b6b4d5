from batch_process_dpla_index_spark.streaming import windows

__all__ = ["windows"]
