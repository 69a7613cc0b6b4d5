"""Metadata-quality (MQ) reporting — the reference's core query."""

from batch_process_dpla_index_spark.quality.mq import (
    contributor_scores,
    item_data,
    provider_scores,
    write_mq_reports,
)
