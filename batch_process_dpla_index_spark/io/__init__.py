"""IO surface: dated paths, catalog discovery, manifests, sinks."""

from batch_process_dpla_index_spark.io.manifest import build_manifest, write_manifest
from batch_process_dpla_index_spark.io.paths import (
    date_path,
    latest_dataset_paths,
    parquet_path,
)
from batch_process_dpla_index_spark.io.sinks import (
    delete_existing,
    purge_keys,
    write_avro,
    write_csv_single,
    write_local,
    write_parquet,
    write_text_gzip,
)
