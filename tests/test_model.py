"""Golden tests for the nested DPLA model: flatten, repair, align.

Covers what the DuckDB oracle can't express natively — byte-level
nested struct shapes — on hand-computed fixture rows (FIXTURES.md
style), plus the divergent-provider alignment path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_process_dpla_index_spark.model.fixtures import (
    synthesize_enriched,
    synthesize_raw,
)
from batch_process_dpla_index_spark.model.flatten import modify_columns
from batch_process_dpla_index_spark.model.repair import fix_schema
from batch_process_dpla_index_spark.model.schema import (
    align_to_schema,
    item_schema,
    schema_ddl,
)


def test_enriched_matches_canonical_schema(docs_small):
    """synthesize_enriched produces exactly the canonical item schema
    (modulo nullability flags, which lit() derivations tighten)."""
    enriched = synthesize_enriched(docs_small)
    assert enriched.schema.simpleString() == item_schema().simpleString()


def test_flatten_golden_row(spark, docs_small):
    """Byte-level golden check of one flattened record (doc_id=1)."""
    flat = modify_columns(synthesize_enriched(docs_small.filter(F.col("doc_id") == 1)))
    row = flat.collect()[0].asDict(recursive=True)
    assert row["id"] == "1"
    assert row["uri"] == "http://dp.la/api/items/1"
    assert row["rights"] == "http://rightsstatements.org/vocab/NoC-US/1.0/"
    # edm_agent macro: uri/scheme unwrapped to plain strings
    assert row["provider"]["uri"] == "http://dp.la/agent/src1"
    assert row["provider"]["name"] == "src1"
    assert row["provider"]["scheme"] == "http://dp.la/scheme"
    assert row["provider"]["exactMatch"] == ["em:src1"]
    # edm_web_resource macro: fileFormat→format, dcRights→rights
    assert row["isShownAt"]["uri"] == "http://example.org/item/1"
    assert row["isShownAt"]["format"] == ["text/html"]
    assert row["isShownAt"]["rights"] == ["free"]
    assert row["isShownAt"]["isReferencedBy"] == "http://example.org/item/1#ref"
    # skos_concept inside sourceResource.language
    doc_lang = docs_small.filter(F.col("doc_id") == 1).collect()[0]["lang"]
    lang = row["sourceResource"]["language"][0]
    assert lang["providedLabel"] == doc_lang and lang["scheme"] == "http://dp.la/scheme"
    # dropped heavy columns
    for gone in ("originalRecord", "sidecar", "messages", "tags", "dplaUri", "edmRights"):
        assert gone not in row
    # struct-over-null quirk: object is a non-null struct of nulls
    assert row["object"] is not None and row["object"]["uri"] == "http://example.org/item/1"


def test_repair_equals_enriched(docs_small):
    """fix_schema(raw) flattens to the same leaves as the directly
    synthesized enriched records (repair-injected typed nulls aside)."""
    flat_a = modify_columns(synthesize_enriched(docs_small))
    flat_b = modify_columns(fix_schema(synthesize_raw(docs_small)))
    cols = ["id", "rights", "provider.name", "sourceResource.title",
            "sourceResource.creator", "iiifManifest"]
    a = flat_a.select(*cols)
    b = flat_b.select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_repair_injects_typed_nulls(docs_small):
    repaired = fix_schema(synthesize_raw(docs_small))
    rows = repaired.select(
        F.col("isShownAt.isReferencedBy").alias("ref"),
        F.get(F.col("sourceResource.collection"), 0).getField("isShownAt").alias("coll_shown"),
    ).collect()
    assert all(r["ref"] is None for r in rows)
    assert all(r["coll_shown"] is None for r in rows)


def test_align_to_schema_missing_and_drifted(spark):
    from pyspark.sql.types import StructType

    df = spark.createDataFrame([(1, "a", 7), (2, "b", 8)], "id INT, name STRING, n INT")
    target = StructType.fromDDL("id BIGINT, name STRING, n BIGINT, extra STRING")
    aligned = align_to_schema(df, target)
    assert aligned.schema == target
    rows = aligned.orderBy("id").collect()
    assert rows[0]["extra"] is None and rows[0]["n"] == 7


def test_schema_ddl_roundtrip(docs_small):
    ddl = schema_ddl(synthesize_enriched(docs_small))
    assert "sourceResource" in ddl and "STRUCT" in ddl.upper()
