"""Spark 4 Python DataSource exposing the pure-Python Avro OCF codec
through the standard reader/writer surface.

``read_avro_py``/``write_avro_py`` (io/avro_py.py) already un-gate the
reference's Avro I/O (ParquetDump.scala:116, SchemaRepair.scala:33)
without the spark-avro JVM package — but only via helper functions.
This module packages the same codec as a registered datasource, so the
standard API shape works unchanged::

    from batch_process_dpla_index_spark.io.avro_datasource import register
    register(spark)
    df = spark.read.format("avro_py").load("/data/items")      # S1
    df.write.format("avro_py").mode("overwrite").save("/out")  # K2

Distribution contract (same as the helper tier):
- one InputPartition per ``.avro`` container → file-parallel scans
  (driver reads ONE header for schema inference; data decodes on
  executors);
- one container per write task, named by task partition id, committed
  via tmp-file rename + driver-side ``_SUCCESS`` so failed tasks never
  leave partial files visible.

The DataSource classes must be picklable (they ship to executors);
everything heavy is imported lazily inside ``read``/``write``.
"""

from __future__ import annotations

import glob as _glob
import os
from collections.abc import Iterator

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


def _expand(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(_glob.glob(os.path.join(path, "*.avro")))
    return sorted(_glob.glob(path)) if any(c in path for c in "*?[") else [path]


def _to_row(value, dt: T.DataType):
    """Decoded Avro value → the tuple shape Spark expects: records
    (dicts keyed by field name) become tuples in schema field order,
    recursively through arrays and maps."""
    if value is None:
        return None
    if isinstance(dt, T.StructType):
        return tuple(_to_row(value.get(f.name), f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return [_to_row(v, dt.elementType) for v in value]
    if isinstance(dt, T.MapType):
        return {k: _to_row(v, dt.valueType) for k, v in value.items()}
    return value


class AvroFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class AvroPyReader(DataSourceReader):
    def __init__(self, schema: T.StructType, files: list[str]) -> None:
        self.schema = schema
        self.files = files

    def partitions(self) -> list[InputPartition]:
        return [AvroFilePartition(p) for p in self.files]

    def read(self, partition: AvroFilePartition) -> Iterator[tuple]:
        from batch_process_dpla_index_spark.io.avro_py import read_container

        with open(partition.path, "rb") as fh:
            _, records = read_container(fh.read())
        for rec in records:
            yield _to_row(rec, self.schema)


class _Committed(WriterCommitMessage):
    def __init__(self, tmp: str, final: str, n: int) -> None:
        self.tmp = tmp
        self.final = final
        self.n = n


class AvroPyWriter(DataSourceWriter):
    """Python data sources support Append and Overwrite save modes
    (Spark raises UNSUPPORTED_DATA_SOURCE_SAVE_MODE for the default
    ErrorIfExists). Part names carry a per-job tag so Append never
    collides with a previous job's files."""

    def __init__(self, schema: T.StructType, path: str, overwrite: bool) -> None:
        import uuid

        self.schema = schema
        self.path = path
        self.overwrite = overwrite
        self.job_tag = uuid.uuid4().hex[:8]  # driver-side, shared by all tasks

    def write(self, iterator) -> WriterCommitMessage:
        from pyspark import TaskContext

        from batch_process_dpla_index_spark.io.avro_py import (
            spark_to_avro_schema,
            write_container,
        )

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        # The attempt number is part of BOTH names: two attempts of the
        # same partition (speculation, zombie tasks) write disjoint tmp
        # files, and only the attempt whose commit message the driver
        # received gets renamed — a zombie surviving past commit keeps
        # writing to its own tmp, never into a committed container.
        attempt = ctx.attemptNumber() if ctx is not None else 0
        os.makedirs(self.path, exist_ok=True)
        final = os.path.join(
            self.path, f"part-{pid:05d}-{self.job_tag}-a{attempt}.avro"
        )
        tmp = final + "._tmp"
        avro_schema = spark_to_avro_schema(self.schema)
        rows = (r.asDict(recursive=True) for r in iterator)
        try:
            first = next(rows)
        except StopIteration:
            return _Committed("", "", 0)  # no empty part files
        import itertools as _it

        with open(tmp, "wb") as fh:
            n = write_container(_it.chain([first], rows), avro_schema, fh)
        return _Committed(tmp, final, n)

    def commit(self, messages) -> None:
        committed = 0
        for m in messages:
            if m is not None and m.n > 0:
                os.replace(m.tmp, m.final)
                committed += 1
        # Failed-then-retried or zombie attempts leave their own
        # part-*-{job_tag}-a*.avro._tmp behind (only the attempt whose
        # message we received was renamed); sweep this job's leftovers
        # so a successful job never accumulates orphan tmp files.
        for leftover in _glob.glob(
            os.path.join(self.path, f"part-*-{self.job_tag}-a*.avro._tmp")
        ):
            try:
                os.remove(leftover)
            except OSError:
                pass
        if committed == 0:
            # Every partition was empty: emit one schema-only container
            # so a subsequent read of this path returns an empty frame
            # with the written schema instead of FileNotFoundError —
            # the round trip must be symmetric for the empty dataset.
            from batch_process_dpla_index_spark.io.avro_py import (
                spark_to_avro_schema,
                write_container,
            )

            empty = os.path.join(self.path, f"part-00000-{self.job_tag}-a0.avro")
            with open(empty, "wb") as fh:
                write_container(iter(()), spark_to_avro_schema(self.schema), fh)
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8"):
            pass

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and m.n > 0 and os.path.exists(m.tmp):
                os.remove(m.tmp)


class AvroPyDataSource(DataSource):
    """``format("avro_py")`` — OCF read/write without the JVM package."""

    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("avro_py requires a path (load(path)/save(path))")
        return path

    def schema(self) -> T.StructType:
        from batch_process_dpla_index_spark.io.avro_py import (
            avro_to_spark_schema,
            read_container,
        )

        files = _expand(self._path())
        if not files:
            raise FileNotFoundError(f"no .avro containers at {self._path()}")
        # Header-only read: the OCF metadata map (magic + schema JSON +
        # codec + sync) lives in the first bytes — never pull a multi-GB
        # container into driver memory for schema inference. 1 MiB covers
        # any sane schema; double on the rare truncated-parse until the
        # header fits.
        size = os.path.getsize(files[0])
        prefix = 1 << 20
        while True:
            with open(files[0], "rb") as fh:
                head = fh.read(min(prefix, size))
            try:
                avro_schema, _ = read_container(head)
                break
            except Exception:
                if prefix >= size:
                    raise
                prefix *= 8
        spark_schema = avro_to_spark_schema(avro_schema)
        if not isinstance(spark_schema, T.StructType):
            raise ValueError("top-level Avro schema must be a record")
        return spark_schema

    def reader(self, schema: T.StructType) -> AvroPyReader:
        return AvroPyReader(schema, _expand(self._path()))

    def writer(self, schema: T.StructType, overwrite: bool) -> AvroPyWriter:
        path = self._path()
        if overwrite:
            from batch_process_dpla_index_spark.io.sinks import delete_existing

            delete_existing(path)
        return AvroPyWriter(schema, path, overwrite)


def register(spark: SparkSession) -> None:
    """Idempotently register ``avro_py`` with the session."""
    from batch_process_dpla_index_spark.session import ship_package

    ship_package(spark)
    spark.dataSource.register(AvroPyDataSource)
