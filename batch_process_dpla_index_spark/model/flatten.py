"""ParquetDump-equivalent flattener (ParquetDump.scala:10-52).

Nested enriched item → analyst-friendly flat(ter) record: wrapped
scalars unwrapped, heavy opaque columns dropped, every EDM class
reshaped through the D2 macros. Single narrow projection — Catalyst's
CollapseProject folds the withColumn stack into one Project over the
scan, and nested-schema pruning drops the never-referenced branches
(SURVEY.md §4). No shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_process_dpla_index_spark.model.edm import (
    dcmi_type_collection,
    dpla_place,
    edm_agent,
    edm_web_resource,
    skos_concept,
)

#: The reference's item-URI prefix (ParquetDump.scala:13).
ITEM_URI_PREFIX = "http://dp.la/api/items/"


def modify_columns(df: DataFrame) -> DataFrame:
    """The ParquetDump reshape (ParquetDump.scala:10-52), step-for-step:

    - uri/id derived from dplaUri.value (substring_index on the item
      URI prefix — F1)
    - originalRecord/sidecar/messages/tags dropped (P4: the heavy
      opaque payloads analysts never read)
    - rights from edmRights.value
    - every web resource / agent / concept / place / collection
      reshaped via the D2 macros
    """
    return (
        df.withColumn("uri", F.col("dplaUri.value"))
        .withColumn("id", F.substring_index(F.col("dplaUri.value"), ITEM_URI_PREFIX, -1))
        .drop("dplaUri")
        .drop("originalRecord")
        .withColumn("hasView", F.transform(F.col("hasView"), edm_web_resource))
        .withColumn("rights", F.col("edmRights.value"))
        .drop("edmRights")
        .drop("sidecar")
        .drop("messages")
        .withColumn("object", edm_web_resource(F.col("object")))
        .withColumn("preview", edm_web_resource(F.col("preview")))
        .withColumn("iiifManifest", F.col("iiifManifest").getItem("value"))
        .withColumn("isShownAt", edm_web_resource(F.col("isShownAt")))
        .withColumn("mediaMaster", F.transform(F.col("mediaMaster"), edm_web_resource))
        .withColumn("provider", edm_agent(F.col("provider")))
        .withColumn("dataProvider", edm_agent(F.col("dataProvider")))
        .withColumn("intermediateProvider", edm_agent(F.col("intermediateProvider")))
        .drop("tags")
        .withColumn(
            "sourceResource",
            F.struct(
                F.col("sourceResource.alternateTitle").alias("alternateTitle"),
                F.transform(F.col("sourceResource.collection"), dcmi_type_collection).alias("collection"),
                F.transform(F.col("sourceResource.contributor"), edm_agent).alias("contributor"),
                F.transform(F.col("sourceResource.creator"), edm_agent).alias("creator"),
                F.col("sourceResource.date").alias("date"),
                F.col("sourceResource.description").alias("description"),
                F.col("sourceResource.extent").alias("extent"),
                F.col("sourceResource.format").alias("format"),
                F.col("sourceResource.identifier").alias("identifier"),
                F.transform(F.col("sourceResource.language"), skos_concept).alias("language"),
                F.transform(F.col("sourceResource.place"), dpla_place).alias("place"),
                F.transform(F.col("sourceResource.publisher"), edm_agent).alias("publisher"),
                F.transform(F.col("sourceResource.relation"), lambda e: e.getItem("value")).alias("relation"),
                F.col("sourceResource.replacedBy").alias("replacedBy"),
                F.col("sourceResource.replaces").alias("replaces"),
                F.col("sourceResource.rights").alias("rights"),
                F.transform(F.col("sourceResource.rightsHolder"), edm_agent).alias("rightsHolder"),
                F.transform(F.col("sourceResource.subject"), skos_concept).alias("subject"),
                F.col("sourceResource.temporal").alias("temporal"),
                F.col("sourceResource.title").alias("title"),
                F.col("sourceResource.type").alias("type"),
            ),
        )
    )
