"""Dated output paths + catalog discovery.

Re-expresses the reference's path conventions
(PathHelper.scala:11-13) and the "latest dated folder per hub"
catalog scan (S3FileHelper.scala:20-31) against any
fsspec-style local filesystem. S3 in the reference is an object
store listed with `/` delimiters; locally the same contract is a
directory tree — provider hubs at the first level, a data-type
subdir, dated snapshot folders below that, lexicographically
latest wins.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone


def _now() -> datetime:
    return datetime.now(timezone.utc)


def date_path(dt: datetime | None = None) -> str:
    """"/yyyy/MM" suffix (PathHelper.scala:11-12)."""
    dt = dt or _now()
    return f"/{dt.strftime('%Y')}/{dt.strftime('%m')}"


def parquet_path(base: str, dt: datetime | None = None) -> str:
    """"<base>/yyyy/MM/all.parquet/" (PathHelper.scala:13)."""
    return base.rstrip("/") + date_path(dt) + "/all.parquet/"


def iso_timestamp(dt: datetime | None = None) -> str:
    dt = dt or _now()
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def dir_timestamp(dt: datetime | None = None) -> str:
    """"yyyyMMdd_HHmmss" (Sitemap.scala:21)."""
    dt = dt or _now()
    return dt.strftime("%Y%m%d_%H%M%S")


def latest_dataset_paths(root: str, data_type: str) -> dict[str, str]:
    """Map provider-hub → path of its lexicographically-latest
    ``<hub>/<data_type>/<dated>/`` snapshot folder
    (S3FileHelper.scala:20-31 semantics, local-FS carrier).

    Hubs without the data type (or with no dated snapshots) are
    skipped, matching the reference's flatMap over
    ``sorted.lastOption``.
    """
    from batch_process_dpla_index_spark.io.fs import get_fs, strip_scheme

    fs = get_fs(root)
    out: dict[str, str] = {}
    for hub_path in fs.list_prefix(strip_scheme(root)):
        hub = os.path.basename(hub_path.rstrip("/"))
        latest = fs.latest_prefix(os.path.join(hub_path, data_type))
        if latest is not None:
            out[hub] = latest
    return out
