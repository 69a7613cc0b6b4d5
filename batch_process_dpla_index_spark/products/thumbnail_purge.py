"""Thumbnail purge (ThumbnailPurge.scala:8-54 semantics).

Derive per-item thumbnail object keys ``i/d/c/h/<id>.jpg`` (first four
id characters as directory levels) and batch-delete them. The
reference ``collect()``s every id to the driver
(ThumbnailPurge.scala:17-23) — SURVEY.md §4 flags that as the one
real scalability hazard in the codebase; this implementation streams
ids through ``toLocalIterator`` (one partition in driver memory at a
time) and deletes in the reference's 1000-key batches.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ITEM_URI_PREFIX = "http://dp.la/api/items/"


def thumbnail_prefix(dpla_id: str) -> str:
    """ThumbnailPurge.thumbnailPrefix (ThumbnailPurge.scala:31-33)."""
    return f"{dpla_id[0]}/{dpla_id[1]}/{dpla_id[2]}/{dpla_id[3]}/{dpla_id}.jpg"


def thumbnail_key_col(dpla_id: F.Column) -> F.Column:
    """Executor-side key derivation (F4 pushed into the plan —
    concat_ws over substrings instead of a driver loop)."""
    return F.concat_ws(
        "/",
        F.substring(dpla_id, 1, 1),
        F.substring(dpla_id, 2, 1),
        F.substring(dpla_id, 3, 1),
        F.substring(dpla_id, 4, 1),
        F.concat(dpla_id, F.lit(".jpg")),
    )


def thumbnail_keys(df: DataFrame, uri_col: str = "dplaUri") -> DataFrame:
    """dplaUri → thumbnail key, entirely in the plan
    (ThumbnailPurge.scala:17-23 equivalents: regexp_replace strip +
    prefix derivation; no collect)."""
    dpla_id = F.regexp_replace(F.col(uri_col), ITEM_URI_PREFIX, "")
    return df.select(thumbnail_key_col(dpla_id).alias("key"))


def execute(
    spark: SparkSession,
    items: DataFrame,
    delete_fn: Callable[[list[str]], None],
    uri_col: str = "dplaUri",
    batch: int = 1000,
) -> int:
    """Purge thumbnails for every item. ``delete_fn`` receives ≤batch
    keys per call (the reference's DeleteObjects contract,
    S3FileHelper.scala:46-55). Returns number of keys submitted.

    Ids stream via toLocalIterator — driver memory holds one partition,
    not the whole 50M-item key list.
    """
    keys = thumbnail_keys(items, uri_col)
    n = 0
    buf: list[str] = []

    def flush(b: list[str]) -> None:
        if b:
            delete_fn(b)

    it: Iterator = keys.toLocalIterator(prefetchPartitions=True)
    for row in it:
        buf.append(row["key"])
        if len(buf) >= batch:
            flush(buf)
            n += len(buf)
            buf = []
    flush(buf)
    n += len(buf)
    return n
