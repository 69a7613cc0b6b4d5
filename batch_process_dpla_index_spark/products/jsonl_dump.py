"""JSONL dump product (JsonlDump.scala:12-88 semantics).

Per-provider opaque-line text scan → DISK_ONLY persist → count →
gzipped per-provider export → n-ary union-all export — all
DataFrame-native (the reference's RDD escape at JsonlDump.scala:26-28
is unnecessary in PySpark: ``spark.read.text`` already is the
one-string-column frame, SURVEY.md P10).

Scale notes: DISK_ONLY persist reads each provider's input once and
serves both exports (the reference's own trick, JsonlDump.scala:29);
the union is a no-shuffle plan concatenation; gzip text write is the
standard committer path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from batch_process_dpla_index_spark.io.manifest import write_manifest
from batch_process_dpla_index_spark.io.sinks import delete_existing, write_text_gzip


@dataclass
class ProviderRecords:
    """JsonlDump.scala:14 analog."""

    provider: str
    input: str
    records: DataFrame
    count: int


def execute(
    spark: SparkSession, provider_paths: dict[str, str], out_dir_base: str
) -> dict[str, int]:
    """Run the dump for {provider → input path}. Returns per-provider
    counts plus "__all__" (JsonlDump.scala:17-67 step-for-step)."""
    out_dir_base = out_dir_base.rstrip("/")

    provider_records: list[ProviderRecords] = []
    for provider, input_path in provider_paths.items():
        records = spark.read.text(input_path).persist(StorageLevel.DISK_ONLY)
        provider_records.append(
            ProviderRecords(provider, input_path, records, records.count())
        )

    try:
        for x in provider_records:
            out_dir = f"{out_dir_base}/{x.provider.replace('/', '')}.jsonl"
            delete_existing(out_dir)
            write_text_gzip(x.records, out_dir)
            write_manifest(
                {"Record count": str(x.count), "Data source": x.input}, out_dir
            )

        all_records = reduce(DataFrame.union, (x.records for x in provider_records))
        total = sum(x.count for x in provider_records)
        out_dir = f"{out_dir_base}/all.jsonl"
        delete_existing(out_dir)
        write_text_gzip(all_records, out_dir)

        opts = {"Total record count": str(total)}
        for x in provider_records:
            opts[f"{x.provider} date source"] = x.input
            opts[f"{x.provider} record count"] = str(x.count)
        write_manifest(opts, out_dir)
    finally:
        for x in provider_records:
            x.records.unpersist()

    counts = {x.provider: x.count for x in provider_records}
    counts["__all__"] = sum(counts.values())
    return counts
