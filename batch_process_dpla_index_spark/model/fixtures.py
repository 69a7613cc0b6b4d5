"""Deterministic DPLA-shaped item synthesis from the documents table.

The driver fixtures (TESTDATA.md) have no nested DPLA table, so the
nested pipeline (repair → flatten → MQ) is exercised on items
synthesized 1:1 from ``documents`` rows with pure modulo rules on
``doc_id``. Every rule is a closed-form function of (doc_id, text,
lang, source), which lets the DuckDB oracle verify the *entire*
nested pipeline end-to-end by computing the expected flat outputs
directly — value-level correctness for reshape logic SQL can't
express natively.

Rules (m = doc_id):
- title empty iff m%5==0 · description empty iff m%4==0 · creator
  empty iff m%3==0 · type empty iff m%2==0 · language empty iff
  m%7==0 · place empty iff m%6==0 · subject empty iff m%8==0 ·
  collection empty iff m%9==0 · date empty iff m%10==0
- rights URI by m%7: 0→NULL, 1→NoC-US, 2→publicdomain, 3→/by/,
  4→/by-sa/, 5|6→InC (closed rights)
- object (→ MQ "preview") null iff m%5==0 · iiifManifest.value null
  iff m%3==0 · mediaMaster non-empty iff m%4==0
- provider.name = source · dataProvider.name = source‖'-dp'‖(m%3)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.model.edm import VALUE_DDL, WEB_RESOURCE_DDL
from batch_process_dpla_index_spark.model.schema import (
    AGENT_DDL,
    DATE_DDL,
    DCMI_DDL,
    PLACE_DDL,
    SKOS_DDL,
)

def _val(c: Column) -> Column:
    return F.struct(c.alias("value"))


def _null(ddl: str) -> Column:
    return F.lit(None).cast(ddl)


def _empty(ddl: str) -> Column:
    return F.array().cast(f"array<{ddl}>")


def _when_empty(cond: Column, elem_ddl: str, *elems: Column) -> Column:
    return F.when(cond, _empty(elem_ddl)).otherwise(F.array(*elems))


def rights_uri(m: Column) -> Column:
    r = m % 7
    return (
        F.when(r == 1, F.lit("http://rightsstatements.org/vocab/NoC-US/1.0/"))
        .when(r == 2, F.lit("http://creativecommons.org/publicdomain/zero/1.0/"))
        .when(r == 3, F.lit("http://creativecommons.org/licenses/by/4.0/"))
        .when(r == 4, F.lit("http://creativecommons.org/licenses/by-sa/4.0/"))
        .when((r == 5) | (r == 6), F.lit("http://rightsstatements.org/vocab/InC/1.0/"))
        .otherwise(F.lit(None).cast("string"))
    )


def _agent(name: Column) -> Column:
    """Canonical (wrapped) edmAgent with derived leaves."""
    return F.struct(
        _val(F.concat(F.lit("http://dp.la/agent/"), name)).alias("uri"),
        name.alias("name"),
        name.alias("providedLabel"),
        F.lit(None).cast("string").alias("note"),
        _val(F.lit("http://dp.la/scheme")).alias("scheme"),
        F.array(_val(F.concat(F.lit("em:"), name))).alias("exactMatch"),
        _empty(VALUE_DDL).alias("closeMatch"),
    )


def _skos(label: Column) -> Column:
    return F.struct(
        label.alias("concept"),
        label.alias("providedLabel"),
        F.lit(None).cast("string").alias("note"),
        _val(F.lit("http://dp.la/scheme")).alias("scheme"),
        F.array(_val(label)).alias("exactMatch"),
        _empty(VALUE_DDL).alias("closeMatch"),
    )


def _place(name: Column) -> Column:
    return F.struct(
        name.alias("name"),
        name.alias("city"),
        F.lit(None).cast("string").alias("county"),
        F.lit("ST").alias("state"),
        F.lit("US").alias("country"),
        F.lit(None).cast("string").alias("region"),
        F.lit("0,0").alias("coordinates"),
        F.array(_val(name)).alias("exactMatch"),
    )


def _web_resource(uri: Column) -> Column:
    return F.struct(
        _val(uri).alias("uri"),
        F.array(F.lit("text/html")).alias("fileFormat"),
        F.array(F.lit("free")).alias("dcRights"),
        F.lit("edm-rights").alias("edmRights"),
        _val(F.concat(uri, F.lit("#ref"))).alias("isReferencedBy"),
    )


def _dcmi(title: Column) -> Column:
    return F.struct(
        title.alias("title"),
        F.concat(title, F.lit(" desc")).alias("description"),
        _web_resource(F.concat(F.lit("http://coll/"), title)).alias("isShownAt"),
    )


def _date(m: Column) -> Column:
    return F.struct(
        F.concat(F.lit("19"), (m % 50 + 50).cast("string")).alias("originalSourceDate"),
        F.lit("1950").alias("begin"),
        F.lit("1999").alias("end"),
    )


def synthesize_enriched(docs: DataFrame) -> DataFrame:
    """documents → canonical enriched nested items (pre-flatten shape,
    SchemaRepair output schema). Pure narrow projection."""
    m = F.col("doc_id")
    uri = F.concat(F.lit("http://dp.la/api/items/"), m.cast("string"))
    source_resource = F.struct(
        _when_empty((m % 2) == 0, "string", F.concat(F.lit("alt-"), (m % 2).cast("string"))).alias("alternateTitle"),
        _when_empty((m % 9) == 0, DCMI_DDL, _dcmi(F.concat(F.lit("coll"), (m % 4).cast("string")))).alias("collection"),
        _when_empty((m % 11) == 0, AGENT_DDL, _agent(F.concat(F.lit("contrib"), (m % 5).cast("string")))).alias("contributor"),
        _when_empty((m % 3) == 0, AGENT_DDL, _agent(F.concat(F.lit("creator"), (m % 7).cast("string")))).alias("creator"),
        _when_empty((m % 10) == 0, DATE_DDL, _date(m)).alias("date"),
        _when_empty((m % 4) == 0, "string", F.substring("text", 1, 40)).alias("description"),
        _empty("string").alias("extent"),
        _when_empty((m % 2) == 0, "string", F.lit("text/plain")).alias("format"),
        _when_empty((m % 13) == 0, SKOS_DDL, _skos(F.concat(F.lit("genre"), (m % 3).cast("string")))).alias("genre"),
        F.array(m.cast("string")).alias("identifier"),
        _when_empty((m % 7) == 0, SKOS_DDL, _skos(F.col("lang"))).alias("language"),
        _when_empty((m % 6) == 0, PLACE_DDL, _place(F.concat(F.lit("city"), (m % 10).cast("string")))).alias("place"),
        _when_empty((m % 12) == 0, AGENT_DDL, _agent(F.concat(F.lit("pub"), (m % 4).cast("string")))).alias("publisher"),
        F.array(_val(F.concat(F.lit("rel-"), (m % 6).cast("string")))).alias("relation"),
        _empty("string").alias("replacedBy"),
        _empty("string").alias("replaces"),
        F.array(F.lit("local rights note")).alias("rights"),
        _when_empty((m % 14) == 0, AGENT_DDL, _agent(F.concat(F.lit("rh"), (m % 2).cast("string")))).alias("rightsHolder"),
        _when_empty((m % 8) == 0, SKOS_DDL, _skos(F.concat(F.lit("subj"), (m % 5).cast("string")))).alias("subject"),
        _when_empty((m % 15) == 0, DATE_DDL, _date(m + 1)).alias("temporal"),
        _when_empty((m % 5) == 0, "string", F.substring("text", 1, 20)).alias("title"),
        _when_empty((m % 2) == 0, "string", F.lit("text")).alias("type"),
    )
    web = _web_resource(F.concat(F.lit("http://example.org/item/"), m.cast("string")))
    return docs.select(
        _val(uri).alias("dplaUri"),
        source_resource.alias("sourceResource"),
        _agent(F.concat(F.col("source"), F.lit("-dp"), (m % 3).cast("string"))).alias("dataProvider"),
        F.col("text").alias("originalRecord"),
        _when_empty((m % 2) == 0, WEB_RESOURCE_DDL, web).alias("hasView"),
        F.when((m % 2) == 0, _null(AGENT_DDL)).otherwise(_agent(F.lit("ip0"))).alias("intermediateProvider"),
        web.alias("isShownAt"),
        F.when((m % 5) == 0, _null(WEB_RESOURCE_DDL)).otherwise(web).alias("object"),
        F.when((m % 6) == 0, _null(WEB_RESOURCE_DDL)).otherwise(web).alias("preview"),
        _agent(F.col("source")).alias("provider"),
        _val(rights_uri(m)).alias("edmRights"),
        F.lit("{}").alias("sidecar"),
        F.array(F.lit("enriched")).alias("messages"),
        m.cast("string").alias("originalId"),
        F.array(_val(F.lit("tag0"))).alias("tags"),
        _val(
            F.when((m % 3) == 0, F.lit(None).cast("string")).otherwise(
                F.concat(F.lit("http://iiif.io/m/"), m.cast("string"))
            )
        ).alias("iiifManifest"),
        _when_empty((m % 4) != 0, WEB_RESOURCE_DDL, web).alias("mediaMaster"),
    )


# --- raw provider shape (SchemaRepair input contract) ----------------------

RAW_AGENT_DDL = (
    "struct<uri:string,name:string,providedLabel:string,note:string,"
    "scheme:string,exactMatch:array<string>,closeMatch:array<string>>"
)
RAW_SKOS_DDL = (
    "struct<concept:string,providedLabel:string,note:string,"
    "scheme:string,exactMatch:array<string>,closeMatch:array<string>>"
)
RAW_WEB_DDL = (
    "struct<uri:string,fileFormat:array<string>,dcRights:array<string>,"
    "edmRights:string>"
)
RAW_PLACE_DDL = (
    "struct<name:string,city:string,county:string,state:string,"
    "country:string,region:string,coordinates:string>"
)
RAW_DCMI_DDL = "struct<title:string,description:string>"


def _raw_agent(name: Column) -> Column:
    return F.struct(
        F.concat(F.lit("http://dp.la/agent/"), name).alias("uri"),
        name.alias("name"),
        name.alias("providedLabel"),
        F.lit(None).cast("string").alias("note"),
        F.lit("http://dp.la/scheme").alias("scheme"),
        F.array(F.concat(F.lit("em:"), name)).alias("exactMatch"),
        _empty("string").alias("closeMatch"),
    )


def _raw_skos(label: Column) -> Column:
    return F.struct(
        label.alias("concept"),
        label.alias("providedLabel"),
        F.lit(None).cast("string").alias("note"),
        F.lit("http://dp.la/scheme").alias("scheme"),
        F.array(label).alias("exactMatch"),
        _empty("string").alias("closeMatch"),
    )


def _raw_place(name: Column) -> Column:
    return F.struct(
        name.alias("name"),
        name.alias("city"),
        F.lit(None).cast("string").alias("county"),
        F.lit("ST").alias("state"),
        F.lit("US").alias("country"),
        F.lit(None).cast("string").alias("region"),
        F.lit("0,0").alias("coordinates"),
    )


def _raw_web(uri: Column) -> Column:
    return F.struct(
        uri.alias("uri"),
        F.array(F.lit("text/html")).alias("fileFormat"),
        F.array(F.lit("free")).alias("dcRights"),
        F.lit("edm-rights").alias("edmRights"),
    )


def synthesize_raw(docs: DataFrame) -> DataFrame:
    """documents → *raw* provider shape (plain-string uris/schemes,
    capital-S SourceResource, missing repaired-only fields) — the
    input contract of model.repair.fix_schema."""
    m = F.col("doc_id")
    uri = F.concat(F.lit("http://dp.la/api/items/"), m.cast("string"))
    source_resource = F.struct(
        _when_empty((m % 2) == 0, "string", F.concat(F.lit("alt-"), (m % 2).cast("string"))).alias("alternateTitle"),
        _when_empty((m % 9) == 0, RAW_DCMI_DDL, F.struct(
            F.concat(F.lit("coll"), (m % 4).cast("string")).alias("title"),
            F.concat(F.lit("coll"), (m % 4).cast("string"), F.lit(" desc")).alias("description"),
        )).alias("collection"),
        _when_empty((m % 11) == 0, RAW_AGENT_DDL, _raw_agent(F.concat(F.lit("contrib"), (m % 5).cast("string")))).alias("contributor"),
        _when_empty((m % 3) == 0, RAW_AGENT_DDL, _raw_agent(F.concat(F.lit("creator"), (m % 7).cast("string")))).alias("creator"),
        _when_empty((m % 10) == 0, DATE_DDL, _date(m)).alias("date"),
        _when_empty((m % 4) == 0, "string", F.substring("text", 1, 40)).alias("description"),
        _empty("string").alias("extent"),
        _when_empty((m % 2) == 0, "string", F.lit("text/plain")).alias("format"),
        _when_empty((m % 13) == 0, RAW_SKOS_DDL, _raw_skos(F.concat(F.lit("genre"), (m % 3).cast("string")))).alias("genre"),
        F.array(m.cast("string")).alias("identifier"),
        _when_empty((m % 7) == 0, RAW_SKOS_DDL, _raw_skos(F.col("lang"))).alias("language"),
        _when_empty((m % 6) == 0, RAW_PLACE_DDL, _raw_place(F.concat(F.lit("city"), (m % 10).cast("string")))).alias("place"),
        _when_empty((m % 12) == 0, RAW_AGENT_DDL, _raw_agent(F.concat(F.lit("pub"), (m % 4).cast("string")))).alias("publisher"),
        F.array(_val(F.concat(F.lit("rel-"), (m % 6).cast("string")))).alias("relation"),
        _empty("string").alias("replacedBy"),
        _empty("string").alias("replaces"),
        F.array(F.lit("local rights note")).alias("rights"),
        _when_empty((m % 14) == 0, RAW_AGENT_DDL, _raw_agent(F.concat(F.lit("rh"), (m % 2).cast("string")))).alias("rightsHolder"),
        _when_empty((m % 8) == 0, RAW_SKOS_DDL, _raw_skos(F.concat(F.lit("subj"), (m % 5).cast("string")))).alias("subject"),
        _when_empty((m % 15) == 0, DATE_DDL, _date(m + 1)).alias("temporal"),
        _when_empty((m % 5) == 0, "string", F.substring("text", 1, 20)).alias("title"),
        _when_empty((m % 2) == 0, "string", F.lit("text")).alias("type"),
    )
    web = _raw_web(F.concat(F.lit("http://example.org/item/"), m.cast("string")))
    return docs.select(
        uri.alias("dplaUri"),
        source_resource.alias("SourceResource"),
        _raw_agent(F.concat(F.col("source"), F.lit("-dp"), (m % 3).cast("string"))).alias("dataProvider"),
        F.col("text").alias("originalRecord"),
        _when_empty((m % 2) == 0, RAW_WEB_DDL, web).alias("hasView"),
        F.when((m % 2) == 0, _null(RAW_AGENT_DDL)).otherwise(_raw_agent(F.lit("ip0"))).alias("intermediateProvider"),
        web.alias("isShownAt"),
        F.when((m % 5) == 0, _null(RAW_WEB_DDL)).otherwise(web).alias("object"),
        F.when((m % 6) == 0, _null(RAW_WEB_DDL)).otherwise(web).alias("preview"),
        _raw_agent(F.col("source")).alias("provider"),
        rights_uri(m).alias("edmRights"),
        F.lit("{}").alias("sidecar"),
        F.array(F.lit("enriched")).alias("messages"),
        m.cast("string").alias("originalId"),
        F.array(F.lit("tag0")).alias("tags"),
        F.when((m % 3) == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("http://iiif.io/m/"), m.cast("string")))
        .alias("iiifManifest"),
        _when_empty((m % 4) != 0, RAW_WEB_DDL, web).alias("mediaMaster"),
    )
