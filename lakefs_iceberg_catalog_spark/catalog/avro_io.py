"""Avro Object Container File I/O for Iceberg metadata interop.

The reference's tables are real Apache Iceberg metadata chains whose
manifest list and manifests are Avro container files (TableMetadataParser /
ManifestLists in the Iceberg core the reference delegates to —
LakeFSTableOperations.java:139,176 loads them via stock Iceberg). This
container has no Python Avro library and no spark-avro DataSource, so:

- **Reader** (`read_container`): a from-scratch implementation of the
  PUBLIC Avro 1.12 specification (binary encoding + object container file
  framing) for the subset of the type system Iceberg metadata uses — which
  is in fact the whole primitive/complex set except recursive types.
  Decodes generically against the embedded writer schema into plain dicts.
- **Writer** (`JvmAvroWriter`): delegates to the REAL Apache Avro Java
  library bundled with Spark (jars/avro-1.12.1.jar) through py4j. Tests
  and fixture builders write with Apache's implementation and read with
  ours, so reader bugs cannot cancel out against a sibling writer — the
  round-trip is a genuine cross-implementation interop check.

Scale note: Avro metadata decoding happens driver-side during query
planning, exactly where Iceberg itself does it; data files are read by
executors via the parquet source. Manifest files are O(files) metadata,
bounded by the same arguments as the JSON manifest chain (manifest.py).
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


class AvroDecodeError(ValueError):
    pass


class _Reader:
    """Binary decoder over a bytes buffer (Avro 1.12 spec, 'Binary
    encoding'). Primitives are zig-zag varints / IEEE floats / length-
    prefixed bytes; complex types recurse on the parsed writer schema."""

    def __init__(self, buf: bytes):
        self._b = buf
        self._pos = 0

    def _take(self, n: int) -> bytes:
        if self._pos + n > len(self._b):
            raise AvroDecodeError("truncated Avro data")
        out = self._b[self._pos : self._pos + n]
        self._pos += n
        return out

    def at_end(self) -> bool:
        return self._pos >= len(self._b)

    def read_long(self) -> int:
        shift, acc = 0, 0
        while True:
            byte = self._take(1)[0]
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 70:
                raise AvroDecodeError("varint too long")
        return (acc >> 1) ^ -(acc & 1)  # zig-zag

    def read_bytes(self) -> bytes:
        return self._take(self.read_long())

    def read_value(self, schema, names: dict):
        """Decode one value of ``schema`` (parsed JSON: str | list | dict).
        ``names`` maps fullname -> named-type definition for references."""
        if isinstance(schema, str):
            if schema in names:
                return self.read_value(names[schema], names)
            t = schema
        elif isinstance(schema, list):  # union: branch index then value
            idx = self.read_long()
            if not 0 <= idx < len(schema):
                raise AvroDecodeError(f"union branch {idx} out of range")
            return self.read_value(schema[idx], names)
        else:
            t = schema["type"]
        if t == "null":
            return None
        if t == "boolean":
            return self._take(1) == b"\x01"
        if t in ("int", "long"):
            return self.read_long()
        if t == "float":
            return struct.unpack("<f", self._take(4))[0]
        if t == "double":
            return struct.unpack("<d", self._take(8))[0]
        if t == "bytes":
            return self.read_bytes()
        if t == "string":
            return self.read_bytes().decode("utf-8")
        if t == "fixed":
            _register_name(schema, names)
            return self._take(int(schema["size"]))
        if t == "enum":
            _register_name(schema, names)
            return schema["symbols"][self.read_long()]
        if t == "record":
            _register_name(schema, names)
            return {
                f["name"]: self.read_value(f["type"], names)
                for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = self.read_long()
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix (skippable form)
                    n = -n
                    self.read_long()
                for _ in range(n):
                    out.append(self.read_value(schema["items"], names))
        if t == "map":
            out = {}
            while True:
                n = self.read_long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    self.read_long()
                for _ in range(n):
                    k = self.read_bytes().decode("utf-8")
                    out[k] = self.read_value(schema["values"], names)
        # nested {"type": <named or nested schema>} wrapper
        if isinstance(t, (dict, list)):
            return self.read_value(t, names)
        if t in names:
            return self.read_value(names[t], names)
        raise AvroDecodeError(f"unsupported Avro type: {t!r}")


def _register_name(schema: dict, names: dict) -> None:
    """Record a named type (record/enum/fixed) under its fullname and short
    name so later references decode (Iceberg's r102/r117-style refs)."""
    name = schema.get("name")
    if not name:
        return
    ns = schema.get("namespace")
    names.setdefault(name, schema)
    if ns:
        names.setdefault(f"{ns}.{name}", schema)


def _open_container(path: str) -> tuple[dict, "_Reader", bytes]:
    """Parse the container header; returns (meta dict incl. parsed
    ``schema``, positioned reader, sync marker)."""
    with open(path, "rb") as f:
        data = f.read()
    r = _Reader(data)
    if r._take(4) != MAGIC:
        raise AvroDecodeError(f"not an Avro container file: {path}")
    meta_schema = {"type": "map", "values": "bytes"}
    meta_raw = r.read_value(meta_schema, {})
    sync = r._take(16)
    meta = dict(meta_raw)  # keys are str, values raw bytes
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise AvroDecodeError(f"unsupported Avro codec: {codec}")
    return {"schema": schema, "codec": codec, "meta": meta}, r, sync


def iter_container(path: str):
    """Stream an Avro Object Container File BLOCK BY BLOCK: returns
    ``(meta, blocks)`` where ``blocks`` yields one list of decoded records
    per container block — peak memory is one block, never the file (the
    property the executor-side data-file scan needs; mirrors the ORC
    stripe streaming)."""
    meta, r, sync = _open_container(path)
    schema, codec = meta["schema"], meta["codec"]

    def blocks():
        names: dict = {}
        while not r.at_end():
            count = r.read_long()
            block = r.read_bytes()
            if r._take(16) != sync:
                raise AvroDecodeError("sync marker mismatch (corrupt block)")
            if codec == "deflate":
                block = zlib.decompress(block, -15)
            br = _Reader(block)
            out = [br.read_value(schema, names) for _ in range(count)]
            if not br.at_end():
                raise AvroDecodeError("trailing bytes in Avro block")
            yield out

    return meta, blocks()


def count_container_rows(path: str) -> int:
    """Total record count from the BLOCK HEADERS only (each block leads
    with its count and byte length; the data is skipped, not decoded) —
    the footer-style metadata pass the single-file writer uses."""
    _, r, sync = _open_container(path)
    total = 0
    while not r.at_end():
        total += r.read_long()
        r._take(r.read_long())  # skip the (possibly compressed) block
        if r._take(16) != sync:
            raise AvroDecodeError("sync marker mismatch (corrupt block)")
    return total


def read_container(path: str) -> tuple[dict, list[dict]]:
    """Parse an Avro Object Container File: returns (file metadata with the
    parsed writer ``schema``, list of decoded records). Codecs: null,
    deflate (raw zlib, the two every Iceberg writer emits by default)."""
    meta, blocks = iter_container(path)
    records: list[dict] = []
    for block in blocks:
        records.extend(block)
    return meta, records


def _avro_json(schema, value, names):
    """Render a Python value as Avro JSON encoding (the spec's canonical
    JSON form): unions are single-key objects tagged with the branch name,
    bytes/fixed are ISO-8859-1 strings, everything else is plain JSON.
    This is how records cross into the JVM — the Java side re-types every
    value from the schema via JsonDecoder, immune to py4j boxing."""
    if isinstance(schema, str) and schema in names:
        schema = names[schema]
    if isinstance(schema, list):  # union
        if value is None:
            if "null" not in schema:
                raise ValueError("None for a union without null")
            return None
        non_null = [s for s in schema if s != "null"]
        if len(non_null) > 1:
            # A multi-branch union needs value-type dispatch to tag the
            # right branch; every schema this writer emits is ["null", X],
            # so refuse loudly instead of mis-tagging (the JVM JsonDecoder
            # would reject or silently re-type the value).
            raise ValueError(
                f"union with {len(non_null)} non-null branches not supported "
                "by the JSON encoder — add value-type branch dispatch first"
            )
        branch = non_null[0]
        return {_branch_tag(branch, names): _avro_json(branch, value, names)}
    t = schema if isinstance(schema, str) else schema["type"]
    if isinstance(schema, dict):
        _register_name(schema, names)
    if t == "null":
        return None
    if t in ("boolean", "int", "long", "string"):
        return value
    if t in ("float", "double"):
        return float(value)
    if t in ("bytes", "fixed"):
        return bytes(value).decode("latin-1")
    if t == "enum":
        return str(value)
    if t == "record":
        return {
            f["name"]: _avro_json(f["type"], value[f["name"]], names)
            for f in schema["fields"]
        }
    if t == "array":
        return [_avro_json(schema["items"], v, names) for v in value]
    if t == "map":
        return {str(k): _avro_json(schema["values"], v, names) for k, v in value.items()}
    if isinstance(t, (dict, list)):
        return _avro_json(t, value, names)
    raise ValueError(f"unsupported Avro type for JSON encoding: {t!r}")


def _branch_tag(branch, names) -> str:
    """Union branch tag per the Avro JSON spec: primitives by type name,
    named types by fullname, array/map by container kind."""
    if isinstance(branch, str):
        if branch in names:
            b = names[branch]
            ns = b.get("namespace")
            return f"{ns}.{b['name']}" if ns else b["name"]
        return branch
    t = branch["type"]
    if t in ("record", "enum", "fixed"):
        ns = branch.get("namespace")
        return f"{ns}.{branch['name']}" if ns else branch["name"]
    return t


class _Writer:
    """Binary ENCODER twin of ``_Reader`` (Avro 1.12 spec, 'Binary
    encoding') for the subset Iceberg DATA files need: primitives,
    ``["null", T]`` unions, flat records. Pure Python and pickle-free,
    so executor tasks can stream rows straight to an Avro data file
    without py4j (the JVM writer is driver-only)."""

    def __init__(self):
        self._buf = io.BytesIO()

    def getvalue(self) -> bytes:
        return self._buf.getvalue()

    def write_long(self, v: int) -> None:
        v = (v << 1) ^ (v >> 63) if v >= 0 else ((-v - 1) << 1) | 1  # zig-zag
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self._buf.write(bytes([b | 0x80]))
            else:
                self._buf.write(bytes([b]))
                return

    def write_bytes(self, v: bytes) -> None:
        self.write_long(len(v))
        self._buf.write(v)

    def write_value(self, schema, value) -> None:
        if isinstance(schema, list):  # union: branch index then value
            if value is None:
                if "null" not in schema:
                    raise ValueError("None for a union without null")
                self.write_long(schema.index("null"))
                return
            branches = [(i, s) for i, s in enumerate(schema) if s != "null"]
            if len(branches) != 1:
                raise ValueError(
                    "only [null, T] unions are supported by this encoder"
                )
            idx, branch = branches[0]
            self.write_long(idx)
            self.write_value(branch, value)
            return
        t = schema if isinstance(schema, str) else schema["type"]
        if t == "null":
            return
        if t == "boolean":
            self._buf.write(b"\x01" if value else b"\x00")
        elif t in ("int", "long"):
            self.write_long(int(value))
        elif t == "float":
            self._buf.write(struct.pack("<f", float(value)))
        elif t == "double":
            self._buf.write(struct.pack("<d", float(value)))
        elif t == "bytes":
            self.write_bytes(bytes(value))
        elif t == "string":
            self.write_bytes(str(value).encode("utf-8"))
        elif t == "record":
            for f in schema["fields"]:
                self.write_value(f["type"], value[f["name"]])
        elif t == "array":
            value = list(value)
            if value:
                self.write_long(len(value))
                for v in value:
                    self.write_value(schema["items"], v)
            self.write_long(0)
        elif t == "map":
            if value:
                self.write_long(len(value))
                for k, v in value.items():
                    self.write_bytes(str(k).encode("utf-8"))
                    self.write_value(schema["values"], v)
            self.write_long(0)
        elif isinstance(t, (dict, list)):
            self.write_value(t, value)
        else:
            raise ValueError(f"unsupported Avro type for encoding: {t!r}")


def write_container(
    path: str,
    schema: dict,
    records,
    codec: str = "deflate",
    block_records: int = 1000,
) -> int:
    """Write an Avro Object Container File with the from-scratch encoder:
    spec framing (magic, metadata map, sync-marked blocks), streaming
    ``records`` (any iterable of dicts) in ``block_records``-sized blocks
    so peak memory is one block. Returns the record count. Deflate is raw
    zlib, the codec stock Iceberg writers default to. Interop-pinned both
    ways in tests: files written here are read back by the REAL Apache
    Avro Java library AND by this module's independent reader."""
    import os as _os

    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec: {codec}")
    sync = _os.urandom(16)
    total = 0
    with open(path, "wb") as f:
        head = _Writer()
        head._buf.write(MAGIC)
        head.write_value(
            {"type": "map", "values": "bytes"},
            {
                "avro.schema": json.dumps(schema).encode("utf-8"),
                "avro.codec": codec.encode("utf-8"),
            },
        )
        head._buf.write(sync)
        f.write(head.getvalue())
        block: list = []

        def flush():
            nonlocal block
            if not block:
                return
            enc = _Writer()
            for rec in block:
                enc.write_value(schema, rec)
            payload = enc.getvalue()
            if codec == "deflate":
                co = zlib.compressobj(9, zlib.DEFLATED, -15)
                payload = co.compress(payload) + co.flush()
            frame = _Writer()
            frame.write_long(len(block))
            frame.write_bytes(payload)
            f.write(frame.getvalue())
            f.write(sync)
            block = []

        for rec in records:
            block.append(rec)
            total += 1
            if len(block) >= block_records:
                flush()
        flush()
    return total


class JvmAvroWriter:
    """Write an Avro container file with the REAL Apache Avro Java library
    (bundled in Spark's jars) via py4j — the independent implementation our
    pure-Python reader is interop-tested against. Records are handed to the
    JVM in Avro JSON encoding and re-typed there by JsonDecoder +
    GenericDatumReader (py4j auto-unboxes java.lang.Long and friends, so
    building GenericRecords field-by-field cannot control numeric widths;
    the schema-driven JSON path can)."""

    def __init__(self, spark):
        self._jvm = spark.sparkContext._jvm

    def write(
        self,
        path: str,
        schema: dict,
        records: list[dict],
        meta: dict | None = None,
        codec: str = "null",
    ) -> None:
        jvm = self._jvm
        jschema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
        datum = jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
        writer = jvm.org.apache.avro.file.DataFileWriter(datum)
        if codec == "deflate":
            # what Iceberg's default (write.avro.compression-codec=gzip)
            # actually lands in the container: CodecFactory.deflateCodec(9)
            writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(9))
        elif codec != "null":
            raise ValueError(f"unsupported codec: {codec}")
        for k, v in (meta or {}).items():
            writer.setMeta(str(k), str(v))
        writer.create(jschema, jvm.java.io.File(path))
        try:
            reader = jvm.org.apache.avro.generic.GenericDatumReader(jschema)
            factory = jvm.org.apache.avro.io.DecoderFactory.get()
            names: dict = {}
            for rec in records:
                line = json.dumps(_avro_json(schema, rec, names))
                decoder = factory.jsonDecoder(jschema, line)
                writer.append(reader.read(None, decoder))
        finally:
            writer.close()
