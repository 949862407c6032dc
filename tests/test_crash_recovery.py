"""Crash-consistency tests (VERDICT r3 item 9): hard-kill the process
mid arena-flush and mid-compaction, reopen, and prove the datadir
serves EXACTLY the pre-crash committed state, with pk->version .idx
sidecars either intact or safely ignored (orphans sweep to .trash).

The storage contract under test mirrors the reference's
double-metablock commit + FileTracker semantics
(io/cstable/cstable_writer.cc:283-292, db/file_tracker.cc): segment
files become durable-visible only through the atomic segments.json
manifest rename, so every kill point leaves either the old or the new
segment set. Deterministic fault points (EVENTQL_TPU_CRASH_POINT,
os._exit = kill -9 equivalent) cover each ordering window; a
SIGKILL-at-random-time loop covers the in-between states. Torn segment
writes (the metablock-slot concern) are covered twice: the .tmp write
is never manifest-live, and corrupt-metablock rejection is separately
tested in test_cstable_v2.
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys
sys.path.insert(0, %(repo)r)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
from eventql_tpu.db.lsm import DurableTableService
from eventql_tpu.plan.nodes import ColumnDefinition, CreateTableNode
from eventql_tpu.core.types import SValue, SType

datadir, phase = sys.argv[1], sys.argv[2]
svc = DurableTableService(datadir, arena_flush_rows=1 << 30)

def table():
    return svc.tables["ev"]

def ins(lo, hi):
    for i in range(lo, hi):
        svc.insert_json("ev", '{"id": %%d, "v": %%d}' %% (i, i * 3))

if phase == "setup":
    svc.create_table(CreateTableNode(
        "ev",
        [ColumnDefinition("id", "UINT64"), ColumnDefinition("v", "UINT64")],
        ["id"], None, [],
    ))
    ins(0, 100)
    table().commit()
elif phase == "crash_commit":
    ins(100, 200)
    table().commit()  # dies at EVENTQL_TPU_CRASH_POINT
    print("COMMIT_RETURNED")
elif phase == "crash_compact":
    ins(100, 200)
    table().commit()
    table().compact()  # dies at EVENTQL_TPU_CRASH_POINT
    print("COMPACT_RETURNED")
elif phase == "killloop":
    i = 200
    while True:
        ins(i, i + 50)
        table().commit()
        print(i + 50, flush=True)
        i += 50
"""


def _run_child(datadir, phase, crash_point=None, timeout=120):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    if crash_point:
        env["EVENTQL_TPU_CRASH_POINT"] = crash_point
    else:
        env.pop("EVENTQL_TPU_CRASH_POINT", None)
    return subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO}, str(datadir), phase],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )


def _reopen_rows(datadir):
    sys.path.insert(0, REPO)
    from eventql_tpu.db.lsm import DurableTableService

    svc = DurableTableService(str(datadir))
    rel = svc.tables["ev"].to_relation()
    ids = np.sort(rel.columns[rel.names.index("id")].data.astype(np.uint64))
    vs = rel.columns[rel.names.index("v")].data.astype(np.uint64)
    assert len(np.unique(ids)) == len(ids), "duplicate primary keys"
    return svc, ids


def _setup(tmp_path):
    r = _run_child(tmp_path, "setup")
    assert r.returncode == 0, r.stderr
    return tmp_path


COMMIT_POINTS = [
    # (crash point, rows visible after reopen)
    ("commit_pre_segment", 100),
    ("commit_pre_replace", 100),   # complete .tmp left behind
    ("commit_post_segment", 100),  # segment landed, not manifest-live
    ("commit_post_index", 100),    # segment + .idx landed, no manifest
    ("commit_post_manifest", 200),  # durable: manifest renamed
]


@pytest.mark.parametrize("point,expect", COMMIT_POINTS)
def test_kill_during_arena_flush(tmp_path, point, expect):
    _setup(tmp_path)
    r = _run_child(tmp_path, "crash_commit", crash_point=point)
    assert r.returncode == 137, (r.returncode, r.stderr)
    assert "COMMIT_RETURNED" not in r.stdout

    svc, ids = _reopen_rows(tmp_path)
    assert list(ids) == list(range(expect)), f"point={point}"

    # orphans (crash remains) were swept out of the table dir
    tdir = os.path.join(str(tmp_path), "ev")
    live = set(json.load(open(os.path.join(tdir, "segments.json")))["segments"])
    for f in os.listdir(tdir):
        if f.endswith(".tmp"):
            pytest.fail(f"stray tmp survived reopen: {f}")
        if f.startswith("segment-") and f.endswith(".cst"):
            assert f in live, f"orphan segment visible: {f}"

    # the pk->version contract survives: a REPLAYED older version of a
    # committed row must drop at write time (idempotent upsert)
    t = svc.tables["ev"]
    from eventql_tpu.core.types import SType, SValue

    assert (
        t.insert_row(
            {"id": SValue(SType.UINT64, 7), "v": SValue(SType.UINT64, 999)},
            version=1,
        )
        is False
    )
    rel = t.to_relation()
    v7 = rel.columns[rel.names.index("v")].data[
        rel.columns[rel.names.index("id")].data.astype(np.uint64) == 7
    ]
    assert int(v7[0]) == 21  # original value, replay dropped


COMPACT_POINTS = [
    # both sides of the manifest flip: old set vs new major
    ("compact_pre_manifest", 2),   # minors still live
    ("compact_post_manifest", 1),  # major live, minors orphaned+swept
]


@pytest.mark.parametrize("point,nsegs", COMPACT_POINTS)
def test_kill_during_compaction(tmp_path, point, nsegs):
    _setup(tmp_path)
    r = _run_child(tmp_path, "crash_compact", crash_point=point)
    assert r.returncode == 137, (r.returncode, r.stderr)
    assert "COMPACT_RETURNED" not in r.stdout

    svc, ids = _reopen_rows(tmp_path)
    # compaction NEVER loses rows, whichever side of the flip the kill
    # hit (the pre-r4 ordering trashed minors before writing the major)
    assert list(ids) == list(range(200)), f"point={point}"
    tdir = os.path.join(str(tmp_path), "ev")
    live = json.load(open(os.path.join(tdir, "segments.json")))["segments"]
    assert len(live) == nsegs
    for seg in live:
        assert os.path.exists(os.path.join(tdir, seg))


def test_sigkill_at_random_time_loop(tmp_path):
    """True external kill -9 at an arbitrary moment during a
    commit-every-50-rows loop: reopen must always serve a prefix
    0..N*50 with no duplicates and no errors."""
    _setup(tmp_path)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("EVENTQL_TPU_CRASH_POINT", None)
    for trial in range(3):
        proc = subprocess.Popen(
            [
                sys.executable,
                "-c",
                CHILD % {"repo": REPO},
                str(tmp_path),
                "killloop",
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            cwd=REPO,
        )
        # let it commit a few batches, then kill at a random point
        time.sleep(0.6 + 0.3 * trial)
        proc.kill()  # SIGKILL, exact pid
        proc.wait(timeout=30)

        svc, ids = _reopen_rows(tmp_path)
        n = len(ids)
        assert n >= 100 and n % 50 == 0, n
        assert list(ids) == list(range(n))
