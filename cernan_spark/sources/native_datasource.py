"""`cernan_native` — a first-class Spark (Python DataSource API) format
for the reference's native wire protocol.

The reference's native source accepts u32-BE length-framed protobuf
``Payload`` messages over TCP (`/root/reference/src/source/native.rs:63-133`).
The batch analog is a *spool*: files of the identical framing, one file
per connection (capture, flight-record, or kafka-dump). This module
registers that spool as a real Spark source::

    spark.dataSource.register(CernanNativeDataSource)
    df = spark.read.format("cernan_native").load("/spool/dir")

Architecture (the 100 TB plan):

* **One InputPartition per spool file** — Spark schedules files across
  executors exactly like any file source; a directory of N files reads
  N-wide. No driver-side decode, no collect.
* **conn_id comes from the file NAME** (``conn-<id>.bin``), not the
  listing order, so the mapping is stable under re-listing/retries —
  the same identity discipline as the file tailer's (dev, inode) key
  (sources/filetail.py).
* The per-frame decode is `functions/nativeproto.py`'s pure-Python
  proto2 codec — identical semantics to the mapInPandas path
  (one row per sample, empty-sample points dropped per native.rs:151-153,
  malformed frames yield one ``record_kind='invalid'`` row instead of
  failing the task, native.rs:198-202).
* A trailing partial frame at EOF is dropped, mirroring
  `functions/framing.frames_from_stream` (a live spool's last frame may
  still be being written — the tail-read contract of filetail.py).
"""

from __future__ import annotations

import os
import re
import struct

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

# Column order must match functions/nativeproto.DECODED_SCHEMA.
_SCHEMA = (
    "conn_id long, frame_idx int, record_kind string, name string, "
    "sample_idx int, value double, kind string, persist boolean, "
    "event_epoch long, tags map<string,string>, bounds array<double>, "
    "path string, payload string"
)

_CONN_RE = re.compile(r"conn-(\d+)\.bin$")


class _SpoolFile(InputPartition):
    def __init__(self, conn_id: int, path: str):
        self.conn_id = conn_id
        self.path = path


class CernanNativeReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("cernan_native requires a path (spool dir)")

    def _files(self) -> list[str]:
        if os.path.isdir(self._path):
            names = sorted(os.listdir(self._path))
            return [os.path.join(self._path, n) for n in names if n.endswith(".bin")]
        return [self._path]

    def partitions(self):
        parts = []
        for i, f in enumerate(self._files()):
            m = _CONN_RE.search(f)
            parts.append(_SpoolFile(int(m.group(1)) if m else i, f))
        if not parts:
            raise ValueError(f"cernan_native: no .bin spool files under {self._path}")
        return parts

    def read(self, partition: _SpoolFile):
        # Import inside the task: the class is pickled by reference and
        # the executor resolves cernan_spark from its own sys.path.
        from cernan_spark.functions.nativeproto import decode_payload

        with open(partition.path, "rb") as fh:
            blob = fh.read()
        cid = partition.conn_id
        off, fidx = 0, 0
        while off + 4 <= len(blob):
            (n,) = struct.unpack(">I", blob[off : off + 4])
            if off + 4 + n > len(blob):
                break  # trailing partial frame → dropped (frames_from_stream contract)
            frame = blob[off + 4 : off + 4 + n]
            off += 4 + n
            try:
                points, lines = decode_payload(frame)
            except Exception:  # noqa: BLE001 — malformed wire bytes
                yield (cid, fidx, "invalid", None, None, None, None,
                       None, None, None, None, None, None)
                fidx += 1
                continue
            for p in points:
                if not p["samples"]:
                    continue  # native.rs:151-153
                epoch = int(p["timestamp_ms"] * 0.001)  # native.rs:149
                for i, s in enumerate(p["samples"]):
                    yield (cid, fidx, "telemetry", p["name"], i, s,
                           p["kind"], p["persist"], epoch, p["metadata"],
                           p["bin_bounds"] or None, None, None)
            for ln in lines:
                yield (cid, fidx, "log", None, None, None, None, None,
                       int(ln["timestamp_ms"] * 0.001), ln["metadata"],
                       None, ln["path"], ln["value"])
            fidx += 1


class CernanNativeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cernan_native"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> CernanNativeReader:
        return CernanNativeReader(self.options)

    def writer(self, schema, overwrite: bool):
        return CernanNativeWriter(self.options, overwrite)

    def simpleStreamReader(self, schema):
        return CernanNativeStreamReader(self.options)


def write_spool(rows, out_dir: str, n_conns: int) -> None:
    """Deterministic spool writer (driver-side test/fixture helper): each
    row dict ``{conn, name, samples, kind, ts_ms, persist?, tags?}``
    becomes ONE framed Payload appended to ``conn-<conn>.bin`` in input
    order — the byte layout native.rs reads off the socket."""
    from cernan_spark.functions.nativeproto import (
        encode_payload,
        encode_telemetry,
    )

    os.makedirs(out_dir, exist_ok=True)
    handles = {}
    try:
        for r in rows:
            c = int(r["conn"]) % n_conns
            if c not in handles:
                handles[c] = open(os.path.join(out_dir, f"conn-{c}.bin"), "wb")
            t = encode_telemetry(
                r["name"],
                list(r["samples"]),
                kind=r.get("kind", "SUM"),
                persist=bool(r.get("persist", False)),
                timestamp_ms=int(r["ts_ms"]),
                metadata=r.get("tags"),
            )
            frame = encode_payload(points=[t])
            handles[c].write(struct.pack(">I", len(frame)) + frame)
    finally:
        for fh in handles.values():
            fh.close()


# ---------------------------------------------------------------------------
# Writer — the native SINK analog (df.write.format("cernan_native"))
# ---------------------------------------------------------------------------

class _SpoolCommit(WriterCommitMessage):
    def __init__(self, pid: int, tmp: str, n: int):
        self.pid = pid
        self.tmp = tmp
        self.n = n


class CernanNativeWriter(DataSourceWriter):
    """Per-task spool writer: each input partition becomes one
    connection file (`conn-<partitionId>.bin`), written to a hidden
    temp name and renamed only in `commit()` — the all-or-nothing
    visibility rule every idempotent sink in this repo follows
    (plans/checkpoint.py), and the batch analog of the native sink's
    flush-then-ack (`/root/reference/src/sink/native.rs` buffers then
    writes whole frames). Input rows: ``conn_id?, name, samples
    array<double>, kind, persist?, ts_ms, tags?``."""

    def __init__(self, options, overwrite: bool):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("cernan_native write requires a path")
        self._overwrite = overwrite

    def write(self, rows):
        import uuid

        from pyspark import TaskContext

        from cernan_spark.functions.nativeproto import (
            encode_payload,
            encode_telemetry,
        )

        pid = TaskContext.get().partitionId()
        os.makedirs(self._path, exist_ok=True)
        tmp = os.path.join(self._path, f".tmp-conn-{pid}-{uuid.uuid4().hex}")
        n = 0
        with open(tmp, "wb") as fh:
            for r in rows:
                t = encode_telemetry(
                    r["name"],
                    [float(s) for s in r["samples"]],
                    kind=r["kind"],
                    persist=bool(r["persist"]) if "persist" in r.__fields__ else False,
                    timestamp_ms=int(r["ts_ms"]),
                    metadata=dict(r["tags"]) if "tags" in r.__fields__ and r["tags"] is not None else None,
                )
                frame = encode_payload(points=[t])
                fh.write(struct.pack(">I", len(frame)) + frame)
                n += 1
        return _SpoolCommit(pid, tmp, n)

    def commit(self, messages):
        if self._overwrite:
            for f in os.listdir(self._path):
                if f.endswith(".bin"):
                    os.remove(os.path.join(self._path, f))
        for m in messages:
            os.replace(m.tmp, os.path.join(self._path, f"conn-{m.pid}.bin"))

    def abort(self, messages):
        for m in messages:
            try:
                os.remove(m.tmp)
            except OSError:
                pass


# ---------------------------------------------------------------------------
# Streaming reader — tail the spool like the TCP accept loop tails sockets
# ---------------------------------------------------------------------------

class CernanNativeStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch tail over a live spool directory: the offset is a
    JSON dict ``{file: [byte_offset, frame_idx]}``; each batch decodes
    every COMPLETE frame appended since the last offset and leaves a
    trailing partial frame for the next batch — byte-for-byte the
    file-tailer's partial-line rule (sources/filetail.py) applied to
    u32-BE frames, and the batch analog of native.rs's continuous
    accept loop. New ``conn-*.bin`` files are picked up at any batch
    (a new connection arriving). ``readBetweenOffsets`` replays a
    committed range deterministically, so recovery re-emits the same
    rows (at-least-once → effectively-once under the framework's
    offset log)."""

    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("cernan_native stream requires a path")

    def initialOffset(self) -> dict:
        return {}

    def _decode_range(self, fname: str, lo: int, hi: int, fidx0: int):
        from cernan_spark.functions.nativeproto import decode_payload

        m = _CONN_RE.search(fname)
        cid = int(m.group(1)) if m else -1
        with open(os.path.join(self._path, fname), "rb") as fh:
            fh.seek(lo)
            blob = fh.read(hi - lo)
        off, fidx = 0, fidx0
        rows = []
        while off + 4 <= len(blob):
            (n,) = struct.unpack(">I", blob[off : off + 4])
            if off + 4 + n > len(blob):
                break
            frame = blob[off + 4 : off + 4 + n]
            off += 4 + n
            try:
                points, lines = decode_payload(frame)
            except Exception:  # noqa: BLE001
                rows.append((cid, fidx, "invalid", None, None, None, None,
                             None, None, None, None, None, None))
                fidx += 1
                continue
            for p in points:
                if not p["samples"]:
                    continue
                epoch = int(p["timestamp_ms"] * 0.001)
                for i, s in enumerate(p["samples"]):
                    rows.append((cid, fidx, "telemetry", p["name"], i, s,
                                 p["kind"], p["persist"], epoch, p["metadata"],
                                 p["bin_bounds"] or None, None, None))
            for ln in lines:
                rows.append((cid, fidx, "log", None, None, None, None, None,
                             int(ln["timestamp_ms"] * 0.001), ln["metadata"],
                             None, ln["path"], ln["value"]))
            fidx += 1
        return rows, lo + off, fidx

    def read(self, start: dict):
        rows, end = [], {}
        names = sorted(
            f for f in os.listdir(self._path) if f.endswith(".bin")
        ) if os.path.isdir(self._path) else []
        for fname in names:
            lo, fidx = start.get(fname, [0, 0])
            size = os.path.getsize(os.path.join(self._path, fname))
            r, consumed, fidx2 = self._decode_range(fname, lo, size, fidx)
            rows.extend(r)
            end[fname] = [consumed, fidx2]
        for fname, pos in start.items():  # a file vanished: hold its offset
            end.setdefault(fname, pos)
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = []
        for fname, (hi, _) in end.items():
            lo, fidx = start.get(fname, [0, 0])
            if hi > lo:
                r, _, _ = self._decode_range(fname, lo, hi, fidx)
                rows.extend(r)
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass
