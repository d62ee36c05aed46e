"""Avro source wire format: v2 payload header + Object Container File codec.

Reference (/root/reference/src/source/avro.rs:27-163):

    [len u32-BE] [version u32-BE] [control u32-BE] [id u64-BE]
    [order_by u64-BE] {v2: [#kv u8] ([klen u8][key][vlen u16-BE][value])*}
    [avro OCF blob ...]

The reference VALIDATES the blob is a well-formed Avro container
(``serde_avro::from_container``) and forwards it opaque; sync-flagged
payloads are ACKed with the payload id. This module goes one step further
for the training-pipeline story: a dependency-free OCF reader (magic, file
metadata map, sync-marker-checked blocks, null codec) that also DECODES
records for flat record schemas of primitive fields — enough to land
telemetry-shaped Avro (``{name, value, ts}``) as typed rows. No Avro
library exists in this image; zigzag-varint primitives are ~40 lines.

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


def _dec_record(buf: io.BytesIO, schema: dict):
    out = {}
    for f in schema["fields"]:
        out[f["name"]] = _PRIM_DEC[f["type"]](buf)
    return out


def _enc_record(rec: dict, schema: dict) -> bytes:
    return b"".join(
        _PRIM_ENC[f["type"]](rec[f["name"]]) for f in schema["fields"]
    )


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
    body = b"".join(_enc_record(r, schema) for r in records)
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
    zlib) and the schema is a flat primitive record, else left as counts
    only (the reference never decodes records at all — value-add)."""
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
        decodable = (
            codec in ("null", "deflate")
            and isinstance(schema, dict)
            and schema.get("type") == "record"
            and all(
                isinstance(f.get("type"), str) and f["type"] in _PRIM_DEC
                for f in schema.get("fields", [])
            )
        )
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
                if codec == "deflate":
                    block = zlib.decompress(block, -15)
                bbuf = io.BytesIO(block)
                for _ in range(count):
                    out["records"].append(_dec_record(bbuf, schema))
        out["decoded"] = decodable
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
    validation + one row per decoded record (record_json; null when the
    schema is not a flat primitive record — the blob stays opaque exactly
    like the reference). Invalid containers — AND malformed payload
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
