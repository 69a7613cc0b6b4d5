from batch_process_dpla_index_spark.sources.tables import (
    TABLES,
    load_table,
    load_tables,
    register_tables,
)

__all__ = ["TABLES", "load_table", "load_tables", "register_tables"]
