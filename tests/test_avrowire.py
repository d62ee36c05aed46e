"""Avro source wire format: OCF reader/writer round trip, container
validation, v2 header metadata KVs, ACK flag, Spark decode operator."""

from __future__ import annotations

import json

from cernan_spark.functions.avrowire import (
    CONTROL_SYNC,
    decode_avro_frames,
    decode_avro_payload,
    encode_avro_payload,
    read_container,
    write_container,
)

SCHEMA = {
    "type": "record",
    "name": "telem",
    "fields": [
        {"name": "name", "type": "string"},
        {"name": "value", "type": "double"},
        {"name": "ts", "type": "long"},
    ],
}
RECS = [
    {"name": "cpu", "value": 0.5, "ts": 1700000000},
    {"name": "mem", "value": -2.25, "ts": 1700000060},
]


def test_container_roundtrip_decodes_records():
    c = read_container(write_container(RECS, SCHEMA))
    assert c["err"] is None
    assert c["codec"] == "null"
    assert c["n_blocks"] == 1 and c["n_records"] == 2
    assert c["records"] == RECS


def test_container_validation_rejects_garbage():
    assert read_container(b"not avro at all")["err"] == "bad magic"
    good = bytearray(write_container(RECS, SCHEMA))
    good[-1] ^= 0xFF  # corrupt the trailing sync marker
    assert read_container(bytes(good))["err"] == "sync marker mismatch"


def test_v2_header_metadata_kvs_and_ack():
    blob = write_container(RECS, SCHEMA)
    buf = encode_avro_payload(
        blob, version=2, control=CONTROL_SYNC, id_=77, order_by=9,
        metadata={b"shard": b"a1", b"tenant": b"blue"},
    )
    p = decode_avro_payload(buf)
    assert (p["version"], p["id"], p["order_by"]) == (2, 77, 9)
    assert p["sync"] is True  # sender expects an ACK with id 77
    assert p["metadata"] == {"shard": b"a1", "tenant": b"blue"}
    assert p["avro_blob"] == blob


def test_v1_header_has_no_metadata_section():
    blob = write_container(RECS, SCHEMA)
    p = decode_avro_payload(encode_avro_payload(blob, version=1, id_=5))
    assert p["metadata"] == {}
    assert p["avro_blob"] == blob


def test_spark_decode_avro_frames(spark):
    blob = write_container(RECS, SCHEMA)
    bad = b"Obj\x01garbage"
    frames = spark.createDataFrame(
        [
            (0, 0, encode_avro_payload(blob, id_=1, control=CONTROL_SYNC)),
            (0, 1, encode_avro_payload(bad, id_=2)),
        ],
        "conn_id long, frame_idx int, frame binary",
    )
    rows = decode_avro_frames(frames).collect()
    ok = [r for r in rows if r["avro_valid"]]
    assert len(ok) == 2  # one row per decoded record
    assert {json.loads(r["record_json"])["name"] for r in ok} == {"cpu", "mem"}
    assert all(r["needs_ack"] for r in ok)
    bad_rows = [r for r in rows if not r["avro_valid"]]
    assert len(bad_rows) == 1 and bad_rows[0]["record_json"] is None


def test_malformed_avro_header_flags_not_fails(spark):
    """ADVICE r2: a truncated/garbage payload header yields one
    avro_valid=false row (the reference's Payload::Invalid), never a job
    failure."""
    frames = spark.createDataFrame(
        [(1, 0, bytearray(b"\x00\x01")), (1, 1, bytearray(b""))],
        "conn_id long, frame_idx int, frame binary",
    )
    rows = decode_avro_frames(frames).collect()
    assert len(rows) == 2
    assert all(r["avro_valid"] is False for r in rows)


NESTED_SCHEMA = {
    "type": "record", "name": "Env", "namespace": "co.x",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "inner", "type": {"type": "record", "name": "Inner",
         "fields": [{"name": "s", "type": "string"},
                    {"name": "u", "type": ["null", "double"]}]}},
        {"name": "tags", "type": {"type": "map", "values": "string"}},
        {"name": "vals", "type": {"type": "array", "items": "long"}},
        {"name": "col", "type": {"type": "enum", "name": "Color",
                                 "symbols": ["RED", "GREEN"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "Fx", "size": 4}},
        {"name": "again", "type": "Inner"},  # named-type reference
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-millis"}},
    ],
}
NESTED_RECS = [
    {"id": 1, "inner": {"s": "a", "u": None}, "tags": {"k": "v", "q": "w"},
     "vals": [1, -2, 3], "col": "GREEN", "fx": b"\x01\x02\x03\x04",
     "again": {"s": "b", "u": 2.5}, "ts": 1700000000000},
    {"id": -7, "inner": {"s": "", "u": 0.25}, "tags": {}, "vals": [],
     "col": "RED", "fx": b"ABCD", "again": {"s": "z", "u": None}, "ts": 0},
]


def test_nested_schema_structural_roundtrip():
    """Nested records, unions, arrays, maps, enums, fixed and named-type
    references all decode (both codecs); bytes/fixed surface as hex."""
    expected = [dict(r, fx=r["fx"].hex()) for r in NESTED_RECS]
    for codec in ("null", "deflate"):
        out = read_container(write_container(NESTED_RECS, NESTED_SCHEMA,
                                             codec=codec))
        assert out["err"] is None and out["decoded"], out["err"]
        assert out["records"] == expected


def test_unwalkable_schema_degrades_to_counts_only():
    """A schema node the walker can't decode (here: an unresolved named
    reference) degrades to counts-only; container validation still runs."""
    blob = write_container(RECS, SCHEMA)
    meta = json.dumps(SCHEMA, sort_keys=True).encode()
    assert meta in blob and b'"double"' in meta
    # same-length replacement keeps the metadata length prefix valid
    poisoned = blob.replace(meta, meta.replace(b'"double"', b'"doubl3"'))
    out = read_container(poisoned)
    assert out["err"] is None          # structure (sync markers) intact
    assert out["decoded"] is False and out["records"] == []
    assert out["n_records"] == len(RECS)
