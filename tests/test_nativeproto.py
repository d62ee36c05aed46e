"""Native-protocol protobuf codec: golden wire bytes, proto2 skip rules,
full Spark encode→frame→stream-split→decode round trip."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from cernan_spark.functions.framing import encode_frames, frames_from_stream
from cernan_spark.functions.nativeproto import (
    decode_native_frames,
    decode_payload,
    encode_logline,
    encode_payload,
    encode_telemetry,
    telemetry_to_native_frames,
)


def test_golden_wire_bytes():
    """Hand-assembled proto2 bytes (native.proto:42-100 numbering) must
    decode exactly, and the encoder must reproduce them byte-for-byte."""
    tel = (
        b"\x0a\x03cpu"                       # 1: name "cpu"
        + b"\x12\x08" + struct.pack("<d", 1.5)  # 2: packed samples [1.5]
        + b"\x18\x01"                        # 3: persisted = true
        + b"\x20\x01"                        # 4: method = SUM
        + b"\x30" + b"\x80\xa0\xbe\x81\xbd\x31"  # 6: timestamp_ms varint
    )
    ts_ms = (0x31 << 35) | (0x3D << 28) | (0x01 << 21) | (0x3E << 14) | (0x20 << 7) | 0x00
    payload = b"\x12" + bytes([len(tel)]) + tel
    points, lines = decode_payload(payload)
    assert lines == []
    (p,) = points
    assert p["name"] == "cpu"
    assert p["samples"] == [1.5]
    assert p["persist"] is True
    assert p["kind"] == "SUM"
    assert p["timestamp_ms"] == ts_ms

    again = encode_payload(points=[encode_telemetry(
        "cpu", [1.5], kind="SUM", persist=True, timestamp_ms=ts_ms
    )])
    assert again == payload


def test_unknown_fields_and_unpacked_doubles_skip():
    """proto2: unknown fields are skipped; repeated doubles may arrive
    unpacked (wire type 1) — native.rs consumers must accept both."""
    tel = (
        b"\x0a\x01x"
        + b"\x11" + struct.pack("<d", 2.0)   # 2: samples, UNPACKED
        + b"\x11" + struct.pack("<d", 3.0)
        + b"\xc2\x01\x03abc"                  # field 24 (unknown), len-delim
        + b"\x78\x05"                         # field 15 (unknown), varint
    )
    (p,), _ = decode_payload(b"\x12" + bytes([len(tel)]) + tel)
    assert p["samples"] == [2.0, 3.0]


def test_logline_roundtrip_and_metadata():
    line = encode_logline(
        "/var/log/app", "boom", metadata={"env": "prod", "az": "b"},
        timestamp_ms=1_700_000_000_123,
    )
    _, (ln,) = decode_payload(encode_payload(lines=[line]))
    assert ln["path"] == "/var/log/app"
    assert ln["value"] == "boom"
    assert ln["metadata"] == {"env": "prod", "az": "b"}
    assert ln["timestamp_ms"] == 1_700_000_000_123


def test_empty_samples_dropped_like_reference(spark):
    """Points with no samples never become telemetry (native.rs:151-153)."""
    frames = spark.createDataFrame(
        [
            (0, 0, encode_payload(points=[
                encode_telemetry("empty", [], kind="SUM"),
                encode_telemetry("ok", [1.0], kind="SUM", timestamp_ms=1000),
            ])),
        ],
        "conn_id long, frame_idx int, frame binary",
    )
    rows = decode_native_frames(frames).collect()
    assert [r["name"] for r in rows] == ["ok"]
    assert rows[0]["event_epoch"] == 1  # (1000 * 0.001) as i64


def test_spark_encode_frame_stream_decode_roundtrip(spark):
    """Full federation path: telemetry rows → payload frames → u32-BE
    framed stream per connection → frame split → decode; multi-sample
    points explode to one row per sample (native.rs:156,176-178)."""
    tel = spark.createDataFrame(
        [
            (1, "cpu", [1.0, 2.0, 3.0], "SUM", 60_000),
            (1, "mem", [7.5], "SET", 60_000),
            (2, "lat", [0.1, 0.2], "SUMMARIZE", 120_000),
        ],
        "conn_id long, name string, samples array<double>, kind string, ts_ms long",
    )
    framed = encode_frames(telemetry_to_native_frames(tel, ts_ms_col="ts_ms"))
    streams = framed.groupBy("conn_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list("framed")),
            F.lit(b""),
            lambda acc, x: F.concat(acc, x),
        ).alias("stream")
    )
    out = decode_native_frames(frames_from_stream(streams))
    got = sorted(
        (r["name"], r["sample_idx"], r["value"], r["kind"], r["event_epoch"])
        for r in out.collect()
    )
    assert got == [
        ("cpu", 0, 1.0, "SUM", 60),
        ("cpu", 1, 2.0, "SUM", 60),
        ("cpu", 2, 3.0, "SUM", 60),
        ("lat", 0, 0.1, "SUMMARIZE", 120),
        ("lat", 1, 0.2, "SUMMARIZE", 120),
        ("mem", 0, 7.5, "SET", 60),
    ]


def test_malformed_native_frame_flags_not_fails(spark):
    """ADVICE r2: one bad frame must not fail the whole job after retries —
    the reference logs + drops invalid payloads (native.rs:198-202)."""
    frames = spark.createDataFrame(
        [(1, 0, bytearray(b"\xff\xff\xff garbage not protobuf \x01"))],
        "conn_id long, frame_idx int, frame binary",
    )
    rows = decode_native_frames(frames).collect()
    assert len(rows) == 1
    assert rows[0]["record_kind"] == "invalid"
    assert rows[0]["name"] is None
