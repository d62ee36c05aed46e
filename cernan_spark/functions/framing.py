"""Binary wire-format handling: the native-protocol and Avro source framing
as column expressions over BinaryType.

Reference:
* native TCP: u32-BE length-framed protobuf payloads
  (/root/reference/src/source/native.rs:63-203; proto
  resources/protobufs/native.proto:42-100);
* avro TCP: fixed header {version u32, control u32, id u64, order_by u64}
  followed by the Avro blob (/root/reference/src/source/avro.rs:27-163).

Spark-first: big-endian integers are decoded with substring+hex+conv column
expressions (JVM-side); frame splitting of a multi-frame byte stream is a
vectorized mapInPandas (struct.unpack over Arrow batches) because variable-
length splitting is not expressible as a single column op.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def be_uint(col: Column, offset: int, nbytes: int) -> Column:
    """Big-endian unsigned int from a binary column (1-based offset)."""
    return F.conv(F.hex(F.substring(col, offset, nbytes)), 16, 10).cast("long")


AVRO_HEADER_LEN = 4 + 4 + 8 + 8


def decode_avro_header(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Header fields + blob as columns (avro.rs:80-163): version/control
    u32-BE, id/order_by u64-BE, rest = Avro blob. Pure expressions."""
    c = F.col(bin_col)
    return df.select(
        "*",
        be_uint(c, 1, 4).alias("version"),
        be_uint(c, 5, 4).alias("control"),
        be_uint(c, 9, 8).alias("id"),
        be_uint(c, 17, 8).alias("order_by"),
        F.expr(f"substring({bin_col}, {AVRO_HEADER_LEN + 1}, 1073741824)").alias(
            "avro_blob"
        ),
    )


#: control-word bit: sync (sender expects an ACK) — avro.rs:36-44
CONTROL_SYNC = 1


def frames_from_stream(
    df: DataFrame, bin_col: str = "stream", id_col: str = "conn_id"
) -> DataFrame:
    """Split u32-BE length-framed byte streams into one row per frame
    (native.rs:63-133). Vectorized over Arrow batches; output preserves
    (conn_id, frame_idx) ordering — the 'order of receipt'."""

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for cid, blob in zip(pdf[id_col], pdf[bin_col]):
                off, i = 0, 0
                blob = bytes(blob)
                while off + 4 <= len(blob):
                    (n,) = struct.unpack(">I", blob[off : off + 4])
                    if off + 4 + n > len(blob):
                        break  # trailing partial frame → dropped (counted upstream)
                    frames.append(blob[off + 4 : off + 4 + n])
                    ids.append(cid)
                    idxs.append(i)
                    off += 4 + n
                    i += 1
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(split, f"{id_col} long, frame_idx int, frame binary")


def encode_frames(df: DataFrame, bin_col: str = "frame") -> DataFrame:
    """Native-sink re-encode: prepend the u32-BE length (native.rs:174-198).
    Length prefix built from hex → unhex column expressions."""
    length = F.length(F.col(bin_col))
    prefix = F.unhex(F.lpad(F.hex(length), 8, "0"))
    return df.withColumn("framed", F.concat(prefix, F.col(bin_col)))
