"""Canonical DPLA MAP item schema + schema utilities.

The canonical *enriched* schema is the output shape of SchemaRepair
(SchemaRepair.scala:88-138): every wrapped-scalar is ``{value}``,
agents/concepts carry wrapped uri/scheme/exactMatch/closeMatch, web
resources carry the repaired 5-field shape. DDL strings (not
StructType literals) so they can be pasted into ``lit(None).cast``
exactly like the reference's wizard comment (SchemaRepair.scala:12-24).

``align_to_schema`` generalizes that comment's manual fix: reconcile
any provider's divergent DataFrame to the canonical schema by
injecting typed-null columns and casting drifted ones — the
schema-reconciliation operator SURVEY.md §1 calls for.

``schema_ddl`` is the SchemaTest surface (SchemaTest.scala:24-26):
one SQL DDL string per DataFrame, diffable across providers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from batch_process_dpla_index_spark.model.edm import VALUE_DDL, WEB_RESOURCE_DDL

AGENT_DDL = (
    "struct<uri:struct<value:string>,name:string,providedLabel:string,"
    "note:string,scheme:struct<value:string>,"
    "exactMatch:array<struct<value:string>>,"
    "closeMatch:array<struct<value:string>>>"
)

SKOS_DDL = (
    "struct<concept:string,providedLabel:string,note:string,"
    "scheme:struct<value:string>,"
    "exactMatch:array<struct<value:string>>,"
    "closeMatch:array<struct<value:string>>>"
)

PLACE_DDL = (
    "struct<name:string,city:string,county:string,state:string,"
    "country:string,region:string,coordinates:string,"
    "exactMatch:array<struct<value:string>>>"
)

DCMI_DDL = (
    f"struct<title:string,description:string,isShownAt:{WEB_RESOURCE_DDL}>"
)

DATE_DDL = "struct<originalSourceDate:string,begin:string,end:string>"

SOURCE_RESOURCE_DDL = (
    "struct<"
    "alternateTitle:array<string>,"
    f"collection:array<{DCMI_DDL}>,"
    f"contributor:array<{AGENT_DDL}>,"
    f"creator:array<{AGENT_DDL}>,"
    f"date:array<{DATE_DDL}>,"
    "description:array<string>,"
    "extent:array<string>,"
    "format:array<string>,"
    f"genre:array<{SKOS_DDL}>,"
    "identifier:array<string>,"
    f"language:array<{SKOS_DDL}>,"
    f"place:array<{PLACE_DDL}>,"
    f"publisher:array<{AGENT_DDL}>,"
    "relation:array<struct<value:string>>,"
    "replacedBy:array<string>,"
    "replaces:array<string>,"
    "rights:array<string>,"
    f"rightsHolder:array<{AGENT_DDL}>,"
    f"subject:array<{SKOS_DDL}>,"
    f"temporal:array<{DATE_DDL}>,"
    "title:array<string>,"
    "type:array<string>"
    ">"
)

#: Canonical enriched item record: field order mirrors the repair
#: projection (SchemaRepair.scala:88-138).
ITEM_FIELDS_DDL: dict[str, str] = {
    "dplaUri": VALUE_DDL,
    "sourceResource": SOURCE_RESOURCE_DDL,
    "dataProvider": AGENT_DDL,
    "originalRecord": "string",
    "hasView": f"array<{WEB_RESOURCE_DDL}>",
    "intermediateProvider": AGENT_DDL,
    "isShownAt": WEB_RESOURCE_DDL,
    "object": WEB_RESOURCE_DDL,
    "preview": WEB_RESOURCE_DDL,
    "provider": AGENT_DDL,
    "edmRights": VALUE_DDL,
    "sidecar": "string",
    "messages": "array<string>",
    "originalId": "string",
    "tags": "array<struct<value:string>>",
    "iiifManifest": VALUE_DDL,
    "mediaMaster": f"array<{WEB_RESOURCE_DDL}>",
}


def item_schema() -> StructType:
    ddl = ",".join(f"{name}:{t}" for name, t in ITEM_FIELDS_DDL.items())
    return StructType.fromDDL(f"struct<{ddl}>")


def schema_ddl(df: DataFrame) -> str:
    """DataFrame schema as a SQL DDL string (SchemaTest.scala:24-26:
    ``df.schema.toDDL`` written per provider for eyeball diffing)."""
    return df.schema.toDDL()


def align_to_schema(df: DataFrame, target: StructType) -> DataFrame:
    """Reconcile a divergent provider DataFrame to a canonical schema.

    Per target field: absent → ``lit(None).cast(ddl)`` (the reference's
    ESDN fix, SchemaRepair.scala:18-19); present but drifted → cast;
    already canonical → passthrough. Extra columns are dropped. Pure
    projection — zero shuffle at any scale, and the typed nulls keep
    downstream nested reads resolvable.
    """
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for field in target.fields:
        if field.name not in have:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        elif have[field.name].dataType != field.dataType:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.col(field.name))
    return df.select(*cols)
