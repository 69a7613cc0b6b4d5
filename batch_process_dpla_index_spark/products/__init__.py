"""End-to-end pipeline products: parquet dump, JSONL dump, sitemap."""

from batch_process_dpla_index_spark.products import jsonl_dump, parquet_dump, sitemap
