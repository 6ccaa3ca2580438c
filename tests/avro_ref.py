"""INDEPENDENT Avro OCF reference codec for tests — written separately
from datamancer_spark/operators/avrocodec.py against the same public
Apache Avro 1.11 specification, so the engine's reader is validated
against bytes it did not produce and the engine's writer against a
decoder it does not share code with (the codec-tier posture:
tests/mpeg_encoder.py, tests/vorbis_encoder.py precedents).

Deliberately different construction: recursive descent over a parsed
schema dict (the engine flattens to a field list), BytesIO streams
(the engine uses bytearray+memoryview offsets), random sync marker
(the engine derives it from the schema), one block per write call.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


def zz_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    u &= 0xFFFFFFFFFFFFFFFF
    out = b""
    while True:
        if u < 0x80:
            return out + bytes([u])
        out += bytes([(u & 0x7F) | 0x80])
        u >>= 7


def zz_read(stream: io.BytesIO) -> int:
    u, shift = 0, 0
    while True:
        b = stream.read(1)[0]
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return (u >> 1) ^ -(u & 1)
        shift += 7


def _write_datum(out: io.BytesIO, v, typ) -> None:
    if isinstance(typ, list):  # ["null", T]
        if v is None:
            out.write(zz_encode(typ.index("null")))
            return
        other = [t for t in typ if t != "null"][0]
        out.write(zz_encode(typ.index(other)))
        _write_datum(out, v, other)
    elif isinstance(typ, dict):  # logical type: encode the base wire
        _write_datum(out, v, typ["type"])
    elif typ in ("long", "int"):
        out.write(zz_encode(int(v)))
    elif typ == "double":
        out.write(struct.pack("<d", float(v)))
    elif typ == "float":
        out.write(struct.pack("<f", float(v)))
    elif typ == "string":
        b = str(v).encode("utf-8")
        out.write(zz_encode(len(b)) + b)
    elif typ == "bytes":
        b = bytes(v)
        out.write(zz_encode(len(b)) + b)
    elif typ == "boolean":
        out.write(b"\x01" if v else b"\x00")
    else:
        raise ValueError(f"ref encoder: type {typ!r}")


def _read_datum(stream: io.BytesIO, typ):
    if isinstance(typ, list):
        branch = typ[zz_read(stream)]
        if branch == "null":
            return None
        return _read_datum(stream, branch)
    if isinstance(typ, dict):  # logical type: raw base-wire value
        return _read_datum(stream, typ["type"])
    if typ in ("long", "int"):
        return zz_read(stream)
    if typ == "double":
        return struct.unpack("<d", stream.read(8))[0]
    if typ == "float":
        return struct.unpack("<f", stream.read(4))[0]
    if typ == "string":
        n = zz_read(stream)
        return stream.read(n).decode("utf-8")
    if typ == "bytes":
        n = zz_read(stream)
        return stream.read(n)
    if typ == "boolean":
        return stream.read(1) == b"\x01"
    raise ValueError(f"ref decoder: type {typ!r}")


def ref_write_ocf(
    path: str,
    schema: dict,
    row_dicts: list[dict],
    codec: str = "deflate",
    rows_per_block: int | None = None,
) -> None:
    """Write an OCF file from row dicts; blocks of rows_per_block
    (default: all rows in one block)."""
    sync = os.urandom(16)
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    out.write(zz_encode(len(meta)))
    for k, v in meta.items():
        kb = k.encode()
        out.write(zz_encode(len(kb)) + kb)
        out.write(zz_encode(len(v)) + v)
    out.write(zz_encode(0))
    out.write(sync)
    step = rows_per_block or max(len(row_dicts), 1)
    for i in range(0, max(len(row_dicts), 1), step):
        chunk = row_dicts[i : i + step]
        if not chunk and i > 0:
            break
        body = io.BytesIO()
        for rd in chunk:
            for f in schema["fields"]:
                _write_datum(body, rd[f["name"]], f["type"])
        data = body.getvalue()
        if codec == "deflate":
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            data = c.compress(data) + c.flush()
        out.write(zz_encode(len(chunk)))
        out.write(zz_encode(len(data)))
        out.write(data)
        out.write(sync)
        if not row_dicts:
            break
    with open(path, "wb") as f:
        f.write(out.getvalue())


def ref_read_ocf(path: str) -> tuple[dict, list[dict]]:
    """Read an OCF file back to (schema dict, row dicts)."""
    with open(path, "rb") as f:
        stream = io.BytesIO(f.read())
    assert stream.read(4) == MAGIC, "ref decoder: bad magic"
    meta = {}
    while True:
        n = zz_read(stream)
        if n == 0:
            break
        if n < 0:
            n = -n
            zz_read(stream)  # byte size, unused
        for _ in range(n):
            kl = zz_read(stream)
            k = stream.read(kl).decode()
            vl = zz_read(stream)
            meta[k] = stream.read(vl)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = stream.read(16)
    rows = []
    while True:
        probe = stream.read(1)
        if not probe:
            break
        stream.seek(-1, io.SEEK_CUR)
        n = zz_read(stream)
        size = zz_read(stream)
        data = stream.read(size)
        assert stream.read(16) == sync, "ref decoder: sync mismatch"
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        body = io.BytesIO(data)
        for _ in range(n):
            rows.append(
                {
                    f["name"]: _read_datum(body, f["type"])
                    for f in schema["fields"]
                }
            )
        assert body.read() == b"", "ref decoder: trailing block bytes"
    return schema, rows
