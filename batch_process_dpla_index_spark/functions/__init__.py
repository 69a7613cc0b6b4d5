from batch_process_dpla_index_spark.functions import presence, text, vectors

__all__ = ["presence", "text", "vectors"]
