"""Pure-Python Avro Object Container File codec + distributed plumbing.

Un-gates S1/K2 (the reference's primary I/O format —
ParquetDump.scala:116 ``spark.read.format("avro")``,
SchemaRepair.scala:33 avro write) in environments without the
spark-avro JVM datasource: this module implements the Avro 1.11 OCF
wire format (magic ``Obj\\x01``, metadata map, sync-marked blocks,
binary record encoding with zigzag varints) from the public
specification, so the files it writes are readable by any Avro
implementation and it reads files any Avro implementation writes
(within the type subset below).

Distributed shape — Spark-first, not driver-side:

- :func:`write_avro_py` writes one ``part-NNNNN.avro`` container per
  DataFrame partition from the executors (``mapInArrow`` +
  ``TaskContext.partitionId`` — the same per-partition write unit as
  the committer path, K6-style); records encode through schema-compiled
  closures (:func:`_compile_encoder`), ~2x the readable reference
  encoder they are pinned byte-identical to.
- :func:`read_avro_py` lists the containers into a ``binaryFile``
  scan, decodes records executor-side (compiled closures), and yields
  Arrow RecordBatches built directly against the target schema via
  ``mapInArrow`` — no JSON detour; schema inference reads a single
  file header driver-side, the data path is fully distributed.

Type subset = the engine's data model (SURVEY.md §1): null, boolean,
int, long, float, double, string, bytes, record, array, map, plus the
timestamp-micros and date logical types. No decimal/fixed/enum (absent
from the reference's model). Per-record Python encoding makes this the
*compatibility* carrier, not the throughput path — parquet remains the
performance format; the reference uses Avro the same way (interchange
in, parquet out).
"""

from __future__ import annotations

import io
import json
import glob as _glob
import os
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
DEFAULT_SYNC = bytes(range(16))  # deterministic marker: files are reproducible


# --------------------------------------------------------------------------
# Spark schema <-> Avro schema
# --------------------------------------------------------------------------

_PRIMITIVES: dict[type, str] = {
    T.StringType: "string",
    T.LongType: "long",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.ByteType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}


def spark_to_avro_schema(dt: T.DataType, name: str = "topLevelRecord", *, _path: str = "") -> object:
    """Spark DataType → Avro schema (JSON-able dict/str). Nested record
    names are derived from the field path (Avro names must be unique
    within a schema)."""
    for cls, avro in _PRIMITIVES.items():
        if isinstance(dt, cls):
            return avro
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.ArrayType):
        items = spark_to_avro_schema(dt.elementType, name, _path=_path + "_item")
        if dt.containsNull:
            items = ["null", items]
        return {"type": "array", "items": items}
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise NotImplementedError("Avro map keys must be strings")
        values = spark_to_avro_schema(dt.valueType, name, _path=_path + "_value")
        if dt.valueContainsNull:
            values = ["null", values]
        return {"type": "map", "values": values}
    if isinstance(dt, T.StructType):
        fields = []
        for f in dt.fields:
            fs = spark_to_avro_schema(f.dataType, f.name, _path=_path + "_" + f.name)
            if f.nullable:
                fs = ["null", fs]
            fields.append({"name": f.name, "type": fs, "default": None} if f.nullable
                          else {"name": f.name, "type": fs})
        return {"type": "record", "name": (name + _path) or "record", "fields": fields}
    raise NotImplementedError(f"unsupported Spark type for Avro: {dt}")


def avro_to_spark_schema(schema: object) -> T.DataType:
    """Avro schema (parsed JSON) → Spark DataType. Unions must be
    ``["null", X]`` (the only union shape the model uses)."""
    if isinstance(schema, str):
        return {
            "string": T.StringType(), "long": T.LongType(), "int": T.IntegerType(),
            "double": T.DoubleType(), "float": T.FloatType(),
            "boolean": T.BooleanType(), "bytes": T.BinaryType(),
            "null": T.NullType(),
        }[schema]
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise NotImplementedError(f"only [null, X] unions supported: {schema}")
        return avro_to_spark_schema(non_null[0])
    t = schema["type"]
    if t == "long" and schema.get("logicalType") == "timestamp-micros":
        return T.TimestampType()
    if t == "int" and schema.get("logicalType") == "date":
        return T.DateType()
    if t in ("string", "long", "int", "double", "float", "boolean", "bytes"):
        return avro_to_spark_schema(t)
    if t == "array":
        return T.ArrayType(avro_to_spark_schema(schema["items"]))
    if t == "map":
        return T.MapType(T.StringType(), avro_to_spark_schema(schema["values"]))
    if t == "record":
        return T.StructType(
            [
                T.StructField(f["name"], avro_to_spark_schema(f["type"]), True)
                for f in schema["fields"]
            ]
        )
    raise NotImplementedError(f"unsupported Avro schema: {schema}")


# --------------------------------------------------------------------------
# Binary encoding (Avro spec §"Binary encoding")
# --------------------------------------------------------------------------


def _zigzag(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_zigzag(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _encode(value, schema, out: bytearray) -> None:
    if isinstance(schema, list):  # [null, X]
        if value is None:
            out += _zigzag(0)
            return
        out += _zigzag(1)
        _encode(value, [s for s in schema if s != "null"][0], out)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t == "int" or t == "long":
        if isinstance(schema, dict) and schema.get("logicalType") == "timestamp-micros":
            import datetime

            if isinstance(value, datetime.datetime):
                if value.tzinfo is None:
                    value = value.replace(tzinfo=datetime.timezone.utc)
                # integer µs since epoch — float .timestamp() loses µs
                # precision past ~year 2243 (2^53 µs)
                value = (
                    value - datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
                ) // datetime.timedelta(microseconds=1)
        elif isinstance(schema, dict) and schema.get("logicalType") == "date":
            import datetime

            if isinstance(value, datetime.date):
                value = (value - datetime.date(1970, 1, 1)).days
        out += _zigzag(int(value))
    elif t == "float":
        out += struct.pack("<f", value)
    elif t == "double":
        out += struct.pack("<d", value)
    elif t == "string":
        raw = value.encode("utf-8")
        out += _zigzag(len(raw))
        out += raw
    elif t == "bytes":
        raw = bytes(value)
        out += _zigzag(len(raw))
        out += raw
    elif t == "record":
        for f in schema["fields"]:
            fv = value.get(f["name"]) if isinstance(value, dict) else getattr(value, f["name"])
            _encode(fv, f["type"], out)
    elif t == "array":
        if value:
            out += _zigzag(len(value))
            for item in value:
                _encode(item, schema["items"], out)
        out += _zigzag(0)
    elif t == "map":
        # dicts from Row.asDict / JSON; (key, value) pair lists from
        # pyarrow's to_pylist rendering of MapType
        items = list(value.items()) if isinstance(value, dict) else list(value or ())
        if items:
            out += _zigzag(len(items))
            for k, v in items:
                _encode(k, "string", out)
                _encode(v, schema["values"], out)
        out += _zigzag(0)
    else:
        raise NotImplementedError(f"encode: {schema}")


def _compile_encoder(schema):
    """Compile an Avro schema into a specialized ``f(value, out)``
    closure tree. Semantically identical to :func:`_encode` (the
    spec-readable reference used by the unit tests), but all schema
    dispatch — isinstance checks, dict lookups, logical-type sniffing —
    happens ONCE per schema node at compile time instead of once per
    value: measured ~2× on the nested EDM model, where the per-record
    recursive dispatch (not zlib) dominates container write cost."""
    if isinstance(schema, list):  # [null, X]
        inner = _compile_encoder([s for s in schema if s != "null"][0])
        z0, z1 = _zigzag(0), _zigzag(1)

        def enc_union(value, out):
            if value is None:
                out += z0
            else:
                out += z1
                inner(value, out)

        return enc_union
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return lambda value, out: None
    if t == "boolean":
        return lambda value, out: out.append(1 if value else 0)
    if t in ("int", "long"):
        logical = schema.get("logicalType") if isinstance(schema, dict) else None
        if logical == "timestamp-micros":
            import datetime

            utc = datetime.timezone.utc
            dt = datetime.datetime
            epoch = dt(1970, 1, 1, tzinfo=utc)
            micro = datetime.timedelta(microseconds=1)

            def enc_ts(value, out):
                if isinstance(value, dt):
                    if value.tzinfo is None:
                        value = value.replace(tzinfo=utc)
                    value = (value - epoch) // micro  # exact integer µs
                out += _zigzag(int(value))

            return enc_ts
        if logical == "date":
            import datetime

            epoch = datetime.date(1970, 1, 1)
            date = datetime.date

            def enc_date(value, out):
                if isinstance(value, date):
                    value = (value - epoch).days
                out += _zigzag(int(value))

            return enc_date
        return lambda value, out: out.__iadd__(_zigzag(int(value)))
    if t == "float":
        pack = struct.Struct("<f").pack
        return lambda value, out: out.__iadd__(pack(value))
    if t == "double":
        pack = struct.Struct("<d").pack
        return lambda value, out: out.__iadd__(pack(value))
    if t == "string":

        def enc_str(value, out):
            raw = value.encode("utf-8")
            out += _zigzag(len(raw))
            out += raw

        return enc_str
    if t == "bytes":

        def enc_bytes(value, out):
            raw = bytes(value)
            out += _zigzag(len(raw))
            out += raw

        return enc_bytes
    if t == "record":
        fields = [(f["name"], _compile_encoder(f["type"])) for f in schema["fields"]]

        def enc_record(value, out):
            get = value.get if isinstance(value, dict) else None
            if get is not None:
                for name, enc in fields:
                    enc(get(name), out)
            else:
                for name, enc in fields:
                    enc(getattr(value, name), out)

        return enc_record
    if t == "array":
        item_enc = _compile_encoder(schema["items"])
        z0 = _zigzag(0)

        def enc_array(value, out):
            if value:
                out += _zigzag(len(value))
                for item in value:
                    item_enc(item, out)
            out += z0

        return enc_array
    if t == "map":
        val_enc = _compile_encoder(schema["values"])
        z0 = _zigzag(0)

        def enc_map(value, out):
            items = (
                list(value.items()) if isinstance(value, dict) else list(value or ())
            )
            if items:
                out += _zigzag(len(items))
                for k, v in items:
                    raw = k.encode("utf-8")
                    out += _zigzag(len(raw))
                    out += raw
                    val_enc(v, out)
            out += z0

        return enc_map
    raise NotImplementedError(f"encode: {schema}")


def _decode(buf: io.BytesIO, schema):
    if isinstance(schema, list):
        idx = _read_zigzag(buf)
        branch = schema[idx]
        return None if branch == "null" else _decode(buf, branch)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        v = _read_zigzag(buf)
        if isinstance(schema, dict) and schema.get("logicalType") == "timestamp-micros":
            import datetime

            return datetime.datetime(
                1970, 1, 1, tzinfo=datetime.timezone.utc
            ) + datetime.timedelta(microseconds=v)
        if isinstance(schema, dict) and schema.get("logicalType") == "date":
            import datetime

            return datetime.date(1970, 1, 1) + datetime.timedelta(days=v)
        return v
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "string":
        return buf.read(_read_zigzag(buf)).decode("utf-8")
    if t == "bytes":
        return buf.read(_read_zigzag(buf))
    if t == "record":
        return {f["name"]: _decode(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_zigzag(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                _read_zigzag(buf)
            for _ in range(n):
                out.append(_decode(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = _read_zigzag(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_zigzag(buf)
            for _ in range(n):
                k = _decode(buf, "string")
                out[k] = _decode(buf, schema["values"])
    raise NotImplementedError(f"decode: {schema}")


def _compile_decoder(schema):
    """Decoder twin of :func:`_compile_encoder`: compile the schema
    into ``f(buf) -> value`` closures so per-record reads skip the
    per-value schema dispatch of the reference :func:`_decode` (which
    remains the spec-readable form the unit tests exercise)."""
    if isinstance(schema, list):
        branches = [
            (None if s == "null" else _compile_decoder(s)) for s in schema
        ]

        def dec_union(buf):
            d = branches[_read_zigzag(buf)]
            return None if d is None else d(buf)

        return dec_union
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return lambda buf: None
    if t == "boolean":
        return lambda buf: buf.read(1) == b"\x01"
    if t in ("int", "long"):
        logical = schema.get("logicalType") if isinstance(schema, dict) else None
        if logical == "timestamp-micros":
            import datetime

            epoch = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
            micros = datetime.timedelta
            return lambda buf: epoch + micros(microseconds=_read_zigzag(buf))
        if logical == "date":
            import datetime

            epoch = datetime.date(1970, 1, 1)
            day = datetime.timedelta
            return lambda buf: epoch + day(days=_read_zigzag(buf))
        return _read_zigzag
    if t == "float":
        unpack = struct.Struct("<f").unpack
        return lambda buf: unpack(buf.read(4))[0]
    if t == "double":
        unpack = struct.Struct("<d").unpack
        return lambda buf: unpack(buf.read(8))[0]
    if t == "string":
        return lambda buf: buf.read(_read_zigzag(buf)).decode("utf-8")
    if t == "bytes":
        return lambda buf: buf.read(_read_zigzag(buf))
    if t == "record":
        fields = [(f["name"], _compile_decoder(f["type"])) for f in schema["fields"]]

        def dec_record(buf):
            return {name: dec(buf) for name, dec in fields}

        return dec_record
    if t == "array":
        item_dec = _compile_decoder(schema["items"])

        def dec_array(buf):
            out = []
            while True:
                n = _read_zigzag(buf)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _read_zigzag(buf)
                for _ in range(n):
                    out.append(item_dec(buf))

        return dec_array
    if t == "map":
        val_dec = _compile_decoder(schema["values"])

        def dec_map(buf):
            out = {}
            while True:
                n = _read_zigzag(buf)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _read_zigzag(buf)
                for _ in range(n):
                    k = buf.read(_read_zigzag(buf)).decode("utf-8")
                    out[k] = val_dec(buf)

        return dec_map
    raise NotImplementedError(f"decode: {schema}")


# --------------------------------------------------------------------------
# Object Container File framing
# --------------------------------------------------------------------------


def write_container(records, avro_schema, fh, codec: str = "deflate",
                    sync: bytes = DEFAULT_SYNC, block_records: int = 1000,
                    compress_level: int = 6) -> int:
    """Write an OCF stream: header + sync-marked blocks. Returns the
    record count.

    ``compress_level``: any level yields a spec-valid deflate stream
    every Avro reader accepts. Measured on the nested EDM model the
    per-record encoding (not zlib) dominates write cost ~10:1, so the
    default keeps zlib's size-friendly 6; drop it only for codecs-
    bound workloads."""
    if codec not in ("null", "deflate"):
        # recording an unimplemented codec in the header while writing
        # raw blocks would produce a file EVERY conforming reader
        # rejects (or mis-decompresses) — fail at write time instead
        raise ValueError(
            f"unsupported avro codec {codec!r} (supported: null, deflate)"
        )
    meta = {
        "avro.schema": json.dumps(avro_schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    fh.write(MAGIC)
    hdr = bytearray()
    hdr += _zigzag(len(meta))
    for k, v in meta.items():
        _encode(k, "string", hdr)
        _encode(v, "bytes", hdr)
    hdr += _zigzag(0)
    fh.write(bytes(hdr))
    fh.write(sync)

    n_total = 0
    block: list = []
    encode = _compile_encoder(avro_schema)

    def flush() -> None:
        nonlocal n_total
        if not block:
            return
        body = bytearray()
        for rec in block:
            encode(rec, body)
        data = bytes(body)
        if codec == "deflate":
            data = zlib.compress(data, compress_level)[2:-4]  # raw deflate per spec
        fh.write(_zigzag(len(block)))
        fh.write(_zigzag(len(data)))
        fh.write(data)
        fh.write(sync)
        n_total += len(block)
        block.clear()

    for rec in records:
        block.append(rec)
        if len(block) >= block_records:
            flush()
    flush()
    return n_total


def read_container(raw: bytes):
    """Parse an OCF byte string → (avro_schema, iterator of records)."""
    buf = io.BytesIO(raw)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_zigzag(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_zigzag(buf)
        for _ in range(n):
            k = _decode(buf, "string")
            meta[k] = _decode(buf, "bytes")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    decode = _compile_decoder(schema)

    def records():
        while True:
            head = buf.read(1)
            if not head:
                return
            buf.seek(-1, 1)
            n = _read_zigzag(buf)
            size = _read_zigzag(buf)
            data = buf.read(size)
            if codec == "deflate":
                data = zlib.decompress(data, -15)
            elif codec != "null":
                raise NotImplementedError(f"codec {codec}")
            bbuf = io.BytesIO(data)
            for _ in range(n):
                yield decode(bbuf)
            if buf.read(16) != sync:
                raise ValueError("sync marker mismatch (corrupt container)")

    return schema, records()


# --------------------------------------------------------------------------
# Distributed plumbing
# --------------------------------------------------------------------------


def write_avro_py(df: DataFrame, path: str, overwrite: bool = True,
                  codec: str = "deflate") -> None:
    """K2 fallback: one OCF part file per DataFrame partition, written
    from the executors (TaskContext partition id names the part — the
    same unit-of-output contract as the committer path).

    Rows reach Python through ``mapInArrow`` — Arrow batches +
    ``to_pylist`` (nested structs arrive as plain dicts, nulls as
    None) — instead of pickled Row objects; on the deeply nested EDM
    model the pickle path spent more time deserializing rows than
    encoding Avro (measured ~2× at sf0.1). The per-partition summary
    row is the action that drives the write."""
    import uuid as _uuid

    from batch_process_dpla_index_spark.io.sinks import delete_existing

    if overwrite:
        delete_existing(path)
    os.makedirs(path, exist_ok=True)
    avro_schema = spark_to_avro_schema(df.schema)
    # job/attempt-tagged tmp names: two attempts of the same partition
    # (speculation, stage retry) must write DISJOINT tmp files or they
    # interleave into one truncated stream and the replace commits a
    # corrupt container — the exact hazard the avro_py datasource
    # writer documents; leftovers are swept after the action
    job_tag = _uuid.uuid4().hex[:12]

    def _write(batches):
        import itertools as _it

        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()

        def recs():
            for b in batches:
                yield from b.to_pylist()

        it = recs()
        try:
            first = next(it)
        except StopIteration:  # no empty part files
            yield pa.RecordBatch.from_pydict(
                {"path": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64())}
            )
            return
        ctx = TaskContext.get()
        full = os.path.join(path, f"part-{pid:05d}.avro")
        tmp = f"{full}.{job_tag}-a{ctx.attemptNumber()}._tmp"
        with open(tmp, "wb") as fh:
            n = write_container(_it.chain([first], it), avro_schema, fh, codec=codec)
        os.replace(tmp, full)  # commit rename, no partial files
        yield pa.RecordBatch.from_pydict({"path": [full], "n": [n]})

    committed = df.mapInArrow(_write, "path string, n bigint").collect()
    for leftover in _glob.glob(
        os.path.join(_glob.escape(path), f"*.{job_tag}-a*._tmp")
    ):
        try:  # failed-then-retried attempts leave their own tmp files
            os.remove(leftover)
        except OSError:
            pass
    if not any(r["n"] for r in committed):
        # every partition was empty: emit one schema-only container so
        # the round trip is symmetric — without it read_avro_py raises
        # FileNotFoundError where the JVM datasource and the avro_py
        # DataSource (AvroPyWriter.commit) both return an empty frame
        empty = os.path.join(path, "part-00000.avro")
        with open(empty, "wb") as fh:
            write_container(iter(()), avro_schema, fh, codec=codec)
    with open(os.path.join(path, "_SUCCESS"), "w", encoding="utf-8"):
        pass


def read_avro_py(spark: SparkSession, *paths: str) -> DataFrame:
    """S1 fallback: distributed OCF scan. ``binaryFile`` ships each
    container to an executor; records decode there (schema-compiled
    closures) and re-enter Spark as Arrow RecordBatches built directly
    against the target schema — no JSON detour, so the only text pass
    left is Avro's own string fields. One file is one input split
    (Avro blocks could split further via the sync markers; containers
    here are one-partition-sized by construction); schema inference
    reads a single header driver-side."""
    expanded: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            hits = sorted(
                _glob.glob(os.path.join(_glob.escape(p), "*.avro"))
            )
        elif any(ch in p for ch in "*?["):
            # accept the same glob-pattern grammar as the avro_py
            # DataSource's _expand — the two read entry points to one
            # codec must not disagree on path syntax
            hits = sorted(_glob.glob(p))
        else:
            hits = [p]
        expanded.extend(hits)
    if not expanded:
        raise FileNotFoundError(f"no .avro containers under {paths}")
    with open(expanded[0], "rb") as fh:
        avro_schema, _ = read_container(fh.read())
    spark_schema = avro_to_spark_schema(avro_schema)
    if not isinstance(spark_schema, T.StructType):
        raise ValueError("top-level Avro schema must be a record")
    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(spark_schema)

    def _decode_files(batches):
        import pyarrow as pa

        for batch in batches:
            for blob in batch.column("content"):
                _, recs = read_container(blob.as_py())
                rows = list(recs)
                if rows:
                    yield pa.RecordBatch.from_pylist(rows, schema=arrow_schema)

    blobs = spark.read.format("binaryFile").load(expanded).select("content")
    return blobs.mapInArrow(_decode_files, spark_schema)
