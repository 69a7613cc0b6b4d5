"""SchemaRepair-equivalent normalization (SchemaRepair.scala:88-138).

Raw provider shape (plain-string uris/schemes, capitalized
``SourceResource``, missing web-resource fields) → the canonical
enriched schema: wrapped scalars, typed-null placeholders, withField
injection for place.exactMatch. Pure projection — no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.model.edm import (
    repair_place,
    to_value_field,
    wrap_agent,
    wrap_dcmi_type_collection,
    wrap_skos_concept,
    wrap_web_resource,
)
from batch_process_dpla_index_spark.model.schema import align_to_schema  # noqa: F401 (re-export)


def fix_schema(df: DataFrame) -> DataFrame:
    """The full repair projection (SchemaRepair.scala:88-138).

    Input contract mirrors the reference's raw avro: a capital-S
    ``SourceResource`` struct whose agents/concepts carry *plain
    string* uri/scheme/exactMatch/closeMatch, web resources without
    isReferencedBy, collections without isShownAt, places without
    exactMatch.
    """
    sr = "SourceResource"
    return df.select(
        to_value_field("dplaUri"),
        F.struct(
            F.col(f"{sr}.alternateTitle").alias("alternateTitle"),
            F.transform(F.col(f"{sr}.collection"), wrap_dcmi_type_collection).alias("collection"),
            F.transform(F.col(f"{sr}.contributor"), wrap_agent).alias("contributor"),
            F.transform(F.col(f"{sr}.creator"), wrap_agent).alias("creator"),
            F.col(f"{sr}.date").alias("date"),
            F.col(f"{sr}.description").alias("description"),
            F.col(f"{sr}.extent").alias("extent"),
            F.col(f"{sr}.format").alias("format"),
            F.transform(F.col(f"{sr}.genre"), wrap_skos_concept).alias("genre"),
            F.col(f"{sr}.identifier").alias("identifier"),
            F.transform(F.col(f"{sr}.language"), wrap_skos_concept).alias("language"),
            repair_place(F.col(f"{sr}.place")).alias("place"),
            F.transform(F.col(f"{sr}.publisher"), wrap_agent).alias("publisher"),
            F.col(f"{sr}.relation").alias("relation"),
            F.col(f"{sr}.replacedBy").alias("replacedBy"),
            F.col(f"{sr}.replaces").alias("replaces"),
            F.col(f"{sr}.rights").alias("rights"),
            F.transform(F.col(f"{sr}.rightsHolder"), wrap_agent).alias("rightsHolder"),
            F.transform(F.col(f"{sr}.subject"), wrap_skos_concept).alias("subject"),
            F.col(f"{sr}.temporal").alias("temporal"),
            F.col(f"{sr}.title").alias("title"),
            F.col(f"{sr}.type").alias("type"),
        ).alias("sourceResource"),
        wrap_agent(F.col("dataProvider")).alias("dataProvider"),
        F.col("originalRecord"),
        F.transform(F.col("hasView"), wrap_web_resource).alias("hasView"),
        wrap_agent(F.col("intermediateProvider")).alias("intermediateProvider"),
        wrap_web_resource(F.col("isShownAt")).alias("isShownAt"),
        wrap_web_resource(F.col("object")).alias("object"),
        wrap_web_resource(F.col("preview")).alias("preview"),
        wrap_agent(F.col("provider")).alias("provider"),
        to_value_field("edmRights"),
        F.col("sidecar"),
        F.col("messages"),
        F.col("originalId"),
        F.transform(F.col("tags"), lambda t: F.struct(t.alias("value"))).alias("tags"),
        to_value_field("iiifManifest"),
        F.transform(F.col("mediaMaster"), wrap_web_resource).alias("mediaMaster"),
    )
