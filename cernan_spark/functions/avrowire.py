"""Avro source wire format: v2 payload header + Object Container File codec.

Reference (/root/reference/src/source/avro.rs:27-163):

    [len u32-BE] [version u32-BE] [control u32-BE] [id u64-BE]
    [order_by u64-BE] {v2: [#kv u8] ([klen u8][key][vlen u16-BE][value])*}
    [avro OCF blob ...]

The reference VALIDATES the blob is a well-formed Avro container
(``serde_avro::from_container``) and forwards it opaque; sync-flagged
payloads are ACKed with the payload id. This module goes one step further
for the training-pipeline story: a dependency-free OCF reader (magic, file
metadata map, sync-marker-checked blocks, null + deflate codecs) that also
DECODES records for any structurally walkable schema — nested records,
unions, arrays, maps, enums, fixed, named-type references — enough to land
arbitrary telemetry-shaped Avro as typed rows. No Avro library exists in
this image; zigzag-varint primitives are ~40 lines.

Arrow-batched via ``mapInPandas`` like the other wire codecs.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MAGIC = b"Obj\x01"
CONTROL_SYNC = 1


# ---------------------------------------------------------------------------
# avro binary primitives (zigzag varints et al.)
# ---------------------------------------------------------------------------

def _enc_long(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _enc_bytes(b: bytes) -> bytes:
    return _enc_long(len(b)) + b


def _enc_str(s: str) -> bytes:
    return _enc_bytes(s.encode("utf-8"))


def _dec_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_dec_long(buf))


_PRIM_ENC = {
    "string": _enc_str,
    "bytes": _enc_bytes,
    "long": _enc_long,
    "int": _enc_long,
    "double": lambda v: struct.pack("<d", v),
    "float": lambda v: struct.pack("<f", v),
    "boolean": lambda v: b"\x01" if v else b"\x00",
    "null": lambda _v: b"",
}

_PRIM_DEC = {
    "string": lambda b: _dec_bytes(b).decode("utf-8"),
    "bytes": _dec_bytes,
    "long": _dec_long,
    "int": _dec_long,
    "double": lambda b: struct.unpack("<d", b.read(8))[0],
    "float": lambda b: struct.unpack("<f", b.read(4))[0],
    "boolean": lambda b: b.read(1) == b"\x01",
    "null": lambda _b: None,
}


# ---------------------------------------------------------------------------
# full structural codec: nested records, unions, arrays, maps, enums, fixed
# (value-add beyond the reference, which forwards every container opaque —
# /root/reference/src/source/avro.rs:80-163 only VALIDATES; decoding nested
# schemas makes the blob queryable as typed rows)
# ---------------------------------------------------------------------------

def _register_named(schema, named: dict) -> None:
    """Pre-walk a schema, registering record/enum/fixed definitions by
    (full)name so later references by name resolve (Avro spec §Names)."""
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed") and "name" in schema:
            ns = schema.get("namespace")
            named[schema["name"]] = schema
            if ns:
                named[f"{ns}.{schema['name']}"] = schema
        if t == "record":
            for f in schema.get("fields", []):
                _register_named(f.get("type"), named)
        elif t == "array":
            _register_named(schema.get("items"), named)
        elif t == "map":
            _register_named(schema.get("values"), named)
    elif isinstance(schema, list):
        for s in schema:
            _register_named(s, named)


def _dec_blocks(buf: io.BytesIO):
    """Array/map item-count blocks: count, or negative count + byte size,
    terminated by 0 (Avro spec §Data Serialization)."""
    while True:
        n = _dec_long(buf)
        if n == 0:
            return
        if n < 0:
            _dec_long(buf)  # block byte size, present in the negative form
            n = -n
        for _ in range(n):
            yield


def _dec_any(buf: io.BytesIO, schema, named: dict):
    """Recursive decode of one value for any Avro schema node."""
    if isinstance(schema, str):
        if schema in _PRIM_DEC:
            return _PRIM_DEC[schema](buf)
        return _dec_any(buf, named[schema], named)  # named-type reference
    if isinstance(schema, list):  # union: zigzag branch index, then value
        idx = _dec_long(buf)
        return _dec_any(buf, schema[idx], named)
    t = schema["type"]
    if t == "record":
        return {
            f["name"]: _dec_any(buf, f["type"], named)
            for f in schema["fields"]
        }
    if t == "array":
        return [_dec_any(buf, schema["items"], named) for _ in _dec_blocks(buf)]
    if t == "map":
        return {
            _dec_bytes(buf).decode("utf-8"): _dec_any(buf, schema["values"], named)
            for _ in _dec_blocks(buf)
        }
    if t == "enum":
        return schema["symbols"][_dec_long(buf)]
    if t == "fixed":
        return buf.read(schema["size"])
    if t in _PRIM_DEC:  # {"type": "long", "logicalType": ...} wrapper form
        return _PRIM_DEC[t](buf)
    raise ValueError(f"undecodable schema node: {t!r}")


def _branch_accepts(val, schema, named: dict) -> bool:
    if isinstance(schema, str) and schema not in _PRIM_ENC:
        schema = named[schema]
    t = schema if isinstance(schema, str) else schema.get("type")
    if val is None:
        return t == "null"
    if isinstance(val, bool):
        return t == "boolean"
    if isinstance(val, int):
        # an "int" branch only accepts 32-bit values; an oversized value
        # must fall through to a "long" branch (["int","long"] unions would
        # otherwise emit an out-of-range int encoding)
        if t == "int":
            return -(1 << 31) <= val < (1 << 31)
        return t == "long"
    if isinstance(val, float):
        return t in ("float", "double")
    if isinstance(val, str):
        return t == "string" or (
            t == "enum" and val in schema.get("symbols", [])
        )
    if isinstance(val, bytes):
        return t == "bytes" or (t == "fixed" and len(val) == schema["size"])
    if isinstance(val, dict):
        if t == "record":
            return set(val) == {f["name"] for f in schema["fields"]}
        return t == "map"
    if isinstance(val, list):
        return t == "array"
    return False


def _enc_any(val, schema, named: dict) -> bytes:
    if isinstance(schema, str):
        if schema in _PRIM_ENC:
            return _PRIM_ENC[schema](val)
        return _enc_any(val, named[schema], named)
    if isinstance(schema, list):
        # writer branch choice: first branch whose shape accepts the value
        for i, s in enumerate(schema):
            if _branch_accepts(val, s, named):
                return _enc_long(i) + _enc_any(val, s, named)
        raise ValueError("no union branch accepts value")
    t = schema["type"]
    if t == "record":
        return b"".join(
            _enc_any(val[f["name"]], f["type"], named) for f in schema["fields"]
        )
    if t == "array":
        body = b"".join(_enc_any(v, schema["items"], named) for v in val)
        return (_enc_long(len(val)) + body if val else b"") + _enc_long(0)
    if t == "map":
        body = b"".join(
            _enc_str(k) + _enc_any(v, schema["values"], named)
            for k, v in val.items()
        )
        return (_enc_long(len(val)) + body if val else b"") + _enc_long(0)
    if t == "enum":
        return _enc_long(schema["symbols"].index(val))
    if t == "fixed":
        assert len(val) == schema["size"]
        return bytes(val)
    if t in _PRIM_ENC:
        return _PRIM_ENC[t](val)
    raise ValueError(f"unencodable schema node: {t!r}")


def _jsonable(v):
    """bytes → hex so decoded records are JSON-serializable losslessly."""
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    return v


# ---------------------------------------------------------------------------
# OCF reader / writer (null codec)
# ---------------------------------------------------------------------------

def write_container(
    records: list[dict],
    schema: dict,
    sync: bytes = b"S" * 16,
    codec: str = "null",
) -> bytes:
    """Minimal OCF writer for tests and the avro sink path. Codecs: null
    and deflate (raw DEFLATE stream per the Avro spec — no zlib header or
    checksum, stdlib zlib with wbits=-15)."""
    meta = {
        "avro.schema": json.dumps(schema, sort_keys=True).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(MAGIC)
    out += _enc_long(len(meta))
    for k in sorted(meta):
        out += _enc_str(k) + _enc_bytes(meta[k])
    out += _enc_long(0)  # end of metadata map
    out += sync
    named: dict = {}
    _register_named(schema, named)
    body = b"".join(_enc_any(r, schema, named) for r in records)
    if codec == "deflate":
        comp = zlib.compressobj(wbits=-15)
        body = comp.compress(body) + comp.flush()
    elif codec != "null":
        raise ValueError(f"unsupported codec: {codec}")
    out += _enc_long(len(records)) + _enc_long(len(body)) + body + sync
    return bytes(out)


def read_container(blob: bytes) -> dict:
    """Parse an OCF: returns {schema, codec, records, n_blocks, err}.
    Structure is fully validated (magic, metadata, per-block sync marker —
    what the reference's from_container checks); records are decoded when
    the codec is null or deflate (raw-DEFLATE blocks inflated via stdlib
    zlib) and the schema walks — nested records, unions, arrays, maps,
    enums, fixed, and named-type references all decode (bytes/fixed values
    surface hex-encoded); an unwalkable schema degrades to counts only
    (the reference never decodes records at all — value-add)."""
    out = {"schema": None, "codec": None, "records": [], "n_blocks": 0,
           "n_records": 0, "decoded": False, "err": None}
    try:
        buf = io.BytesIO(blob)
        if buf.read(4) != MAGIC:
            out["err"] = "bad magic"
            return out
        meta: dict[str, bytes] = {}
        while True:
            n = _dec_long(buf)
            if n == 0:
                break
            for _ in range(abs(n)):
                if n < 0:
                    _dec_long(buf)  # block byte size (negative-count form)
                    n = abs(n)
                k = _dec_bytes(buf).decode("utf-8")
                meta[k] = _dec_bytes(buf)
        schema = json.loads(meta["avro.schema"])
        codec = meta.get("avro.codec", b"null").decode()
        out["schema"], out["codec"] = schema, codec
        sync = buf.read(16)
        # full structural decode for any walkable schema (nested records,
        # unions, arrays, maps, enums, fixed); falls back to counts-only on
        # the first undecodable block — container validation is unaffected
        decodable = codec in ("null", "deflate")
        named: dict = {}
        _register_named(schema, named)
        while True:
            head = buf.read(1)
            if not head:
                break  # clean EOF
            buf.seek(-1, io.SEEK_CUR)
            count = _dec_long(buf)
            size = _dec_long(buf)
            block = buf.read(size)
            if buf.read(16) != sync:
                out["err"] = "sync marker mismatch"
                return out
            out["n_blocks"] += 1
            out["n_records"] += count
            if decodable:
                try:
                    if codec == "deflate":
                        block = zlib.decompress(block, -15)
                    bbuf = io.BytesIO(block)
                    recs = [
                        _jsonable(_dec_any(bbuf, schema, named))
                        for _ in range(count)
                    ]
                    if bbuf.read(1):
                        raise ValueError("trailing bytes after last record")
                    out["records"].extend(recs)
                except Exception:  # noqa: BLE001 — schema walk mismatch
                    decodable = False
                    out["records"] = []
        out["decoded"] = decodable and out["err"] is None
        return out
    except Exception as e:  # noqa: BLE001 — invalid container
        out["err"] = f"invalid container: {e}"
        return out


# ---------------------------------------------------------------------------
# v2 payload header (+ metadata KVs) — avro.rs:60-140
# ---------------------------------------------------------------------------

def encode_avro_payload(
    blob: bytes,
    version: int = 2,
    control: int = 0,
    id_: int = 0,
    order_by: int = 0,
    metadata: dict[bytes, bytes] | None = None,
) -> bytes:
    out = bytearray(struct.pack(">IIQQ", version, control, id_, order_by))
    if version >= 2:
        kvs = metadata or {}
        out += struct.pack(">B", len(kvs))
        for k in sorted(kvs):
            out += struct.pack(">B", len(k)) + k
            out += struct.pack(">H", len(kvs[k])) + kvs[k]
    out += blob
    return bytes(out)


def decode_avro_payload(buf: bytes) -> dict:
    """Header + v2 metadata KVs + blob (avro.rs Payload::from)."""
    version, control, id_, order_by = struct.unpack(">IIQQ", buf[:24])
    pos = 24
    metadata: dict[str, bytes] = {}
    if version >= 2:
        n_kv = buf[pos]
        pos += 1
        for _ in range(n_kv):
            klen = buf[pos]
            pos += 1
            key = buf[pos : pos + klen].decode("utf-8", errors="replace")
            pos += klen
            (vlen,) = struct.unpack(">H", buf[pos : pos + 2])
            pos += 2
            metadata[key] = buf[pos : pos + vlen]
            pos += vlen
    return {
        "version": version,
        "control": control,
        "id": id_,
        "order_by": order_by,
        "sync": bool(control & CONTROL_SYNC),
        "metadata": metadata,
        "avro_blob": buf[pos:],
    }


# ---------------------------------------------------------------------------
# DataFrame operator
# ---------------------------------------------------------------------------

AVRO_DECODED_SCHEMA = (
    "conn_id long, frame_idx int, version long, id long, order_by long, "
    "needs_ack boolean, meta map<string,string>, avro_valid boolean, "
    "n_blocks long, n_records long, record_json string"
)


def decode_avro_frames(frames: DataFrame, frame_col: str = "frame") -> DataFrame:
    """Decode length-stripped avro-source frames: header fields + container
    validation + one row per decoded record (record_json is the structural
    decode of ANY walkable schema — nested records, unions, arrays, maps,
    enums, fixed, named refs; an unwalkable schema degrades to counts-only
    rows with record_json null). Invalid containers — AND malformed payload
    headers, which the reference maps to Payload::Invalid and drops —
    yield one row with avro_valid=false instead of failing the job."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, fidx, blob in zip(
                pdf["conn_id"], pdf["frame_idx"], pdf[frame_col]
            ):
                try:
                    p = decode_avro_payload(bytes(blob))
                except Exception:  # noqa: BLE001 — malformed header bytes
                    rows.append(
                        (cid, fidx, None, None, None, None, {}, False,
                         0, 0, None)
                    )
                    continue
                meta = {
                    k: v.decode("utf-8", errors="replace")
                    for k, v in p["metadata"].items()
                }
                c = read_container(p["avro_blob"])
                base = (
                    cid, fidx, p["version"], p["id"], p["order_by"],
                    p["sync"], meta, c["err"] is None, c["n_blocks"],
                    c["n_records"],
                )
                if c["records"]:
                    for rec in c["records"]:
                        rows.append((*base, json.dumps(rec, sort_keys=True)))
                else:
                    rows.append((*base, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "conn_id", "frame_idx", "version", "id", "order_by",
                    "needs_ack", "meta", "avro_valid", "n_blocks",
                    "n_records", "record_json",
                ],
            )

    return frames.mapInPandas(run, AVRO_DECODED_SCHEMA)
