"""EDM/DPLA value-class reshape macros (SURVEY.md §1, D2).

Plain ``Column -> Column`` expression combinators — never UDFs — so
Catalyst keeps constant-folding, nested-schema pruning, and
whole-stage codegen through every reshape (the reference's own D2
style: ParquetDump.scala:54-113).

Two families:

- flatten-side (``edm_agent`` etc.): unwrap ``{value: string}``
  wrappers into plain strings while renaming web-resource fields —
  the ParquetDump direction (nested enriched → analyst-friendly).
- repair-side (``wrap_*``): the inverse direction used by SchemaRepair
  (SchemaRepair.scala:37-86): wrap plain strings back into
  ``{value}`` structs and inject typed-null placeholders for fields
  a provider never shipped.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: DDL of the repaired/canonical edmWebResource (SchemaRepair.scala:64-70).
WEB_RESOURCE_DDL = (
    "struct<uri:struct<value:string>,fileFormat:array<string>,"
    "dcRights:array<string>,edmRights:string,"
    "isReferencedBy:struct<value:string>>"
)

VALUE_DDL = "struct<value:string>"


def _passthrough(col: Column, name: str) -> Column:
    """ParquetDump.scala:55-56."""
    return col.getItem(name).alias(name)


def _de_value(col: Column, name: str) -> Column:
    """Unwrap a {value} wrapper field (ParquetDump.scala:58-59)."""
    return col.getItem(name).getItem("value").alias(name)


def edm_web_resource(col: Column) -> Column:
    """Flatten-side edmWebResource (ParquetDump.scala:106-113):
    uri unwrapped, fileFormat→format, dcRights→rights."""
    return F.struct(
        col.getItem("uri").getItem("value").alias("uri"),
        col.getItem("fileFormat").alias("format"),
        col.getItem("dcRights").alias("rights"),
        col.getItem("edmRights").alias("edmRights"),
        col.getItem("isReferencedBy").getItem("value").alias("isReferencedBy"),
    )


def edm_agent(col: Column) -> Column:
    """Flatten-side edmAgent (ParquetDump.scala:89-104)."""
    return F.struct(
        _de_value(col, "uri"),
        _passthrough(col, "name"),
        _passthrough(col, "providedLabel"),
        _passthrough(col, "note"),
        _de_value(col, "scheme"),
        F.transform(col.getItem("exactMatch"), lambda e: e.getItem("value")).alias("exactMatch"),
        F.transform(col.getItem("closeMatch"), lambda e: e.getItem("value")).alias("closeMatch"),
    )


def skos_concept(col: Column) -> Column:
    """Flatten-side skosConcept (ParquetDump.scala:79-87)."""
    return F.struct(
        _passthrough(col, "concept"),
        _passthrough(col, "providedLabel"),
        _passthrough(col, "note"),
        _de_value(col, "scheme"),
        F.transform(col.getItem("exactMatch"), lambda e: e.getItem("value")).alias("exactMatch"),
        F.transform(col.getItem("closeMatch"), lambda e: e.getItem("value")).alias("closeMatch"),
    )


def dpla_place(col: Column) -> Column:
    """Flatten-side dplaPlace (ParquetDump.scala:60-70)."""
    return F.struct(
        _passthrough(col, "name"),
        _passthrough(col, "city"),
        _passthrough(col, "county"),
        _passthrough(col, "state"),
        _passthrough(col, "country"),
        _passthrough(col, "region"),
        _passthrough(col, "coordinates"),
        _de_value(col, "exactMatch"),
    )


def dcmi_type_collection(col: Column) -> Column:
    """Flatten-side dcmiTypeCollection (ParquetDump.scala:72-77)."""
    return F.struct(
        _passthrough(col, "title"),
        _passthrough(col, "description"),
        edm_web_resource(col.getItem("isShownAt")).alias("isShownAt"),
    )


# --- repair-side (SchemaRepair direction: raw → canonical nested) ----------


def to_value_field(name: str) -> Column:
    """Wrap a plain string column into {value} (SchemaRepair.scala:37-38)."""
    return F.struct(F.col(name).alias("value")).alias(name)


def wrap_agent(col: Column) -> Column:
    """Repair-side edmAgent (SchemaRepair.scala:40-50): wrap uri/scheme/
    exactMatch/closeMatch scalars into {value} structs."""
    return F.struct(
        F.struct(col.getField("uri").alias("value")).alias("uri"),
        col.getField("name").alias("name"),
        col.getField("providedLabel").alias("providedLabel"),
        col.getField("note").alias("note"),
        F.struct(col.getField("scheme").alias("value")).alias("scheme"),
        F.transform(col.getField("exactMatch"), lambda x: F.struct(x.alias("value"))).alias("exactMatch"),
        F.transform(col.getField("closeMatch"), lambda x: F.struct(x.alias("value"))).alias("closeMatch"),
    )


def wrap_web_resource(col: Column) -> Column:
    """Repair-side edmWebResource (SchemaRepair.scala:55-62): wraps uri,
    injects a typed-null isReferencedBy the raw data never carried."""
    return F.struct(
        F.struct(col.getField("uri").alias("value")).alias("uri"),
        col.getField("fileFormat").alias("fileFormat"),
        col.getField("dcRights").alias("dcRights"),
        col.getField("edmRights").alias("edmRights"),
        F.lit(None).cast(VALUE_DDL).alias("isReferencedBy"),
    )


def wrap_skos_concept(col: Column) -> Column:
    """Repair-side skosConcept (SchemaRepair.scala:73-81)."""
    return F.struct(
        col.getField("concept").alias("concept"),
        col.getField("providedLabel").alias("providedLabel"),
        col.getField("note").alias("note"),
        F.struct(col.getField("scheme").alias("value")).alias("scheme"),
        F.transform(col.getField("exactMatch"), lambda x: F.struct(x.alias("value"))).alias("exactMatch"),
        F.transform(col.getField("closeMatch"), lambda x: F.struct(x.alias("value"))).alias("closeMatch"),
    )


def wrap_dcmi_type_collection(col: Column) -> Column:
    """Repair-side dcmiTypeCollection (SchemaRepair.scala:64-71):
    typed-null isShownAt placeholder."""
    return F.struct(
        col.getField("title").alias("title"),
        col.getField("description").alias("description"),
        F.lit(None).cast(WEB_RESOURCE_DDL).alias("isShownAt"),
    )


def repair_place(col: Column) -> Column:
    """Repair-side dplaPlace array (SchemaRepair.scala:83-86):
    withField-inject an exactMatch placeholder into every element."""
    return F.transform(
        col,
        lambda place: place.withField(
            "exactMatch", F.array(F.lit(None).cast(VALUE_DDL))
        ),
    )
