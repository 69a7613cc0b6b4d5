"""Sitemap product (Sitemap.scala:13-101 semantics, committer-safe).

Product contract: the item-id column becomes ≤``max_rows``-URL XML
subfiles plus one ``<sitemapindex>`` listing exactly those subfiles,
plus a _MANIFEST. Differences from the reference mechanism, same
product:

- Subfile assignment is a *deterministic portable hash* (h60 mod n)
  instead of opaque JVM hash repartitioning — same shuffle shape
  (one exchange on the part key), but the id→subfile map is
  reproducible in any engine, including the DuckDB oracle.
- Subfiles are written from executors via ``foreachPartition``
  (the reference's K6 executor-put, local-FS carrier) after a
  groupBy that builds one XML document per part — no driver
  round-trip for the bulk data.
- ``exact=True`` switches to strict ≤max_rows chunking via a global
  row_number — a single-partition sort, test/small-scale only; the
  hash mode is the 100 TB path (the reference's own ≤50k is likewise
  approximate: hash partitioning only bounds the *average*,
  Sitemap.scala:26-27).
"""

from __future__ import annotations

import math
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.functions.text import h60
from batch_process_dpla_index_spark.io.manifest import write_manifest
from batch_process_dpla_index_spark.io.paths import dir_timestamp, iso_timestamp
from batch_process_dpla_index_spark.io.sinks import write_local

MAX_ROWS = 50_000  # max URLs per subfile (Sitemap.scala:17)
ITEM_URL_PREFIX = "https://dp.la/item/"  # Sitemap.scala:62


def url_entry(id_col, timestamp: str):
    """One <url> element per id (buildSubfile, Sitemap.scala:61-80),
    as a Column expression so subfile bodies assemble executor-side."""
    return F.concat(
        F.lit("<url><loc>" + ITEM_URL_PREFIX),
        id_col,
        F.lit(f"</loc><lastmod>{timestamp}</lastmod>"
              "<changefreq>monthly</changefreq></url>"),
    )


def assign_subfiles(
    ids: DataFrame,
    id_col: str = "id",
    max_rows: int = MAX_ROWS,
    exact: bool = False,
    id_count: int | None = None,
) -> tuple[DataFrame, int]:
    """(id, part) assignment + part count n = ⌈count/max_rows⌉.

    Pass ``id_count`` when the caller already counted the frame — the
    count is a full scan job, and :func:`execute` needs the same number
    for its manifest (one count job total, not two)."""
    count = ids.count() if id_count is None else id_count
    n = max(1, math.ceil(count / max_rows))
    if exact:
        from pyspark.sql.window import Window

        # opt-in exact mode only; one_bucket silences the WindowExec
        # warning without changing the single-partition contract
        from batch_process_dpla_index_spark.functions.windows import one_bucket

        w = Window.partitionBy(one_bucket(F.col(id_col))).orderBy(F.col(id_col))
        assigned = ids.withColumn(
            "part", ((F.row_number().over(w) - 1) / max_rows).cast("int")
        )
    else:
        assigned = ids.withColumn("part", F.pmod(h60(F.col(id_col)), F.lit(n)).cast("int"))
    return assigned, n


def build_index(base_url: str, subfiles: list[str], timestamp: str) -> str:
    """<sitemapindex> over subfile names (buildIndex, Sitemap.scala:82-101)."""
    parts = "".join(
        f"<sitemap><loc>{escape(base_url.rstrip('/') + '/' + s)}</loc>"
        f"<lastmod>{timestamp}</lastmod></sitemap>"
        for s in subfiles
    )
    return (
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + parts
        + "</sitemapindex>"
    )


def execute(
    spark,
    items: DataFrame,
    out_path: str,
    sitemap_url_prefix: str,
    id_col: str = "id",
    max_rows: int = MAX_ROWS,
    gzip_subfiles: bool = False,
    exact: bool = False,
    now=None,
) -> str:
    """The full product (Sitemap.scala:13-59): ids → XML subfiles +
    index + _MANIFEST. Returns out_path."""
    ts = iso_timestamp(now)
    dir_ts = dir_timestamp(now)

    ids = items.select(F.col(id_col).cast("string").alias("id"))
    id_count = ids.count()
    assigned, _n = assign_subfiles(ids, "id", max_rows, exact, id_count=id_count)

    # Persisted: read twice below (executor-side writes + the tiny
    # part-number collect) — without it the whole groupBy recomputes.
    subfile_bodies = (
        assigned.select("part", url_entry(F.col("id"), ts).alias("entry"))
        .groupBy("part")
        .agg(F.concat_ws("", F.array_sort(F.collect_list("entry"))).alias("body"))
        .persist()
    )

    suffix = ".xml.gz" if gzip_subfiles else ".xml"
    use_gzip = gzip_subfiles

    def _write_partition(rows):
        # Self-contained executor closure (stdlib only — no package
        # imports on the worker side; K6 executor-put, local carrier).
        import gzip as _gzip
        import os as _os

        for row in rows:
            full = _os.path.join(
                out_path, f"{dir_ts}/all_item_urls_{row['part']}{suffix}"
            )
            _os.makedirs(_os.path.dirname(full), exist_ok=True)
            body = (
                '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                + row["body"]
                + "</urlset>"
            )
            if use_gzip:
                with _gzip.open(full, "wt", encoding="utf-8") as f:
                    f.write(body)
            else:
                with open(full, "w", encoding="utf-8") as f:
                    f.write(body)

    subfile_bodies.foreachPartition(_write_partition)

    # Part numbers actually populated (tiny: ≤ n rows to the driver).
    parts = sorted(r["part"] for r in subfile_bodies.select("part").collect())
    subfile_bodies.unpersist()
    subfile_names = [f"{dir_ts}/all_item_urls_{p}{suffix}" for p in parts]

    write_local(out_path, "all_item_urls.xml",
                build_index(sitemap_url_prefix, subfile_names, ts))
    write_manifest(
        {
            "Source": "items",
            "Subfile directory": dir_ts,
            "Sitemap URL prefix": sitemap_url_prefix,
            "Total URL count": str(id_count),
            "Max URLs per subfile": str(max_rows),
        },
        out_path,
        timestamp=ts,
    )
    return out_path
