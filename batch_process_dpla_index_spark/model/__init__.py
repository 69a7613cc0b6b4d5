"""Nested DPLA MAP data model: EDM reshape macros, canonical schema,
flattener (ParquetDump parity), schema repair/alignment."""

from batch_process_dpla_index_spark.model.edm import (
    dcmi_type_collection,
    dpla_place,
    edm_agent,
    edm_web_resource,
    skos_concept,
)
from batch_process_dpla_index_spark.model.flatten import modify_columns
from batch_process_dpla_index_spark.model.repair import align_to_schema, fix_schema
from batch_process_dpla_index_spark.model.schema import schema_ddl
