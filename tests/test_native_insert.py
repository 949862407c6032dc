"""Native batch JSON insert: the C++ shredder must match the Python
per-record path byte-for-byte — values, null masks, coercions, error
messages, and insert-up-to-error semantics (reference: the C++ insert
path shreds records into column batches, db/table_service.cc:883-897;
our Python path is the semantic reference)."""

import json

import numpy as np
import pytest

from eventql_tpu.columnar import native
from eventql_tpu.core.errors import RuntimeError_
from eventql_tpu.db.lsm import DurableTableService
from eventql_tpu.db.table_service import TableService
from eventql_tpu.plan.nodes import ColumnDefinition, CreateTableNode

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _mk(columns, pk=None, name="t"):
    svc = TableService()
    svc.create_table(
        CreateTableNode(
            name,
            [ColumnDefinition(n, t) for n, t in columns],
            pk or [],
            None,
            [],
        )
    )
    return svc


def _rel_dump(svc, name="t"):
    rel = svc.get_table_data(name)
    out = []
    for i in range(rel.num_rows):
        out.append(
            tuple(
                None if not c.valid[i] else c.value_at(i).payload()
                for c in rel.columns
            )
        )
    return rel.names, out


COLS = [("u", "UINT64"), ("f", "DOUBLE"), ("s", "STRING"),
        ("b", "BOOL"), ("ts", "DATETIME")]

RECORDS = [
    {"u": 5, "f": 1.5, "s": "plain", "b": True, "ts": 1000},
    {"u": "42", "f": "2.25", "s": "", "b": False},          # strings→nums
    {"u": -3, "f": 7, "s": "xé☃", "b": 1},        # wrap + unicode
    {"u": 3.9, "f": True, "s": 123, "b": 0.0},              # cross coercions
    {"u": None, "f": None, "s": None, "b": None, "ts": None},
    {},                                                       # all missing
    {"u": "  8.5e1 ", "f": "-.5", "b": "true", "s": "q\"uo\\te\n"},
    {"b": "True"},                                           # != "true" → F
    {"u": False, "ts": "123"},
]


def test_batch_matches_per_record_path():
    svc_a = _mk(COLS)
    for r in RECORDS:
        svc_a.insert_json("t", json.dumps(r))
    svc_b = _mk(COLS)
    n = svc_b.insert_json_batch("t", json.dumps(RECORDS).encode())
    assert n == len(RECORDS)
    # the batch really took the native path (columnar arena)
    assert svc_b.tables["t"]._batches and not svc_b.tables["t"].rows
    assert _rel_dump(svc_a) == _rel_dump(svc_b)


def test_shred_error_message_and_partial_insert_parity():
    bad = [{"u": 1}, {"u": 2}, {"u": "nope"}, {"u": 4}]
    svc_a = _mk(COLS)
    err_a = None
    for r in bad:
        try:
            svc_a.insert_json("t", json.dumps(r))
        except RuntimeError_ as e:
            err_a = str(e)
            break
    svc_b = _mk(COLS)
    with pytest.raises(RuntimeError_) as ei:
        svc_b.insert_json_batch("t", json.dumps(bad).encode())
    assert str(ei.value) == err_a == "can't convert nope to UINT64"
    # rows before the error stayed inserted on both paths
    assert _rel_dump(svc_a) == _rel_dump(svc_b)
    assert len(_rel_dump(svc_b)[1]) == 2


def test_unknown_column_error_parity():
    svc_a = _mk(COLS)
    try:
        svc_a.insert_json("t", json.dumps({"u": 1, "zz": 2}))
        raise AssertionError("expected error")
    except RuntimeError_ as e:
        msg_a = str(e)
    svc_b = _mk(COLS)
    with pytest.raises(RuntimeError_) as ei:
        svc_b.insert_json_batch(
            "t", json.dumps([{"u": 1, "zz": 2}]).encode()
        )
    assert str(ei.value) == msg_a == "column not found: 'zz'"


@pytest.mark.parametrize(
    "records",
    [
        [{"u": 1 << 70}],               # big int: Python wraps mod 2^64
        [{"u": "inf"}],                 # only Python decides inf/nan
        [{"u": "1_0"}],                 # underscore float syntax
        [{"s": 1.5}],                   # float→string formatting
        [{"u": "１"}],              # unicode digits
    ],
)
def test_fallback_cases_match_python(records):
    svc_a = _mk(COLS)
    err_a = out_a = None
    try:
        for r in records:
            svc_a.insert_json("t", json.dumps(r))
        out_a = _rel_dump(svc_a)
    except Exception as e:  # noqa: BLE001 — compare error surface
        err_a = (type(e).__name__, str(e))
    svc_b = _mk(COLS)
    err_b = out_b = None
    try:
        svc_b.insert_json_batch("t", json.dumps(records).encode())
        out_b = _rel_dump(svc_b)
    except Exception as e:  # noqa: BLE001
        err_b = (type(e).__name__, str(e))
    assert err_a == err_b
    assert out_a == out_b


def test_mixed_row_and_batch_order_preserved():
    svc = _mk([("k", "STRING"), ("v", "UINT64")])
    svc.insert_json("t", json.dumps({"k": "a", "v": 1}))
    svc.insert_json_batch(
        "t", json.dumps([{"k": "b", "v": 2}, {"k": "c", "v": 3}]).encode()
    )
    svc.insert_json("t", json.dumps({"k": "d", "v": 4}))
    _names, rows = _rel_dump(svc)
    assert [r[0] for r in rows] == [b"a", b"b", b"c", b"d"]
    assert [r[1] for r in rows] == [1, 2, 3, 4]


def test_nested_record_table_falls_back():
    """Tables with RECORD prefixes use the Python path (walk2)."""
    svc = TableService()
    svc.create_table(
        CreateTableNode(
            "n",
            [
                ColumnDefinition("k", "STRING"),
                ColumnDefinition(
                    "rec", "RECORD",
                    subcolumns=[ColumnDefinition("x", "UINT64")],
                ),
            ],
            [],
            None,
            [],
        )
    )
    svc.insert_json_batch(
        "n", json.dumps([{"k": "a", "rec": {"x": 7}}]).encode()
    )
    rel = svc.get_table_data("n")
    assert rel.num_rows == 1
    assert rel.columns[rel.names.index("rec.x")].value_at(0).payload() == 7


def test_lsm_batch_flush_reopen_and_upsert(tmp_path):
    from eventql_tpu.db.lsm import DurableTableService

    svc = DurableTableService(str(tmp_path), arena_flush_rows=8)
    svc.create_table(
        CreateTableNode(
            "ev",
            [ColumnDefinition("t", "UINT64"), ColumnDefinition("v", "UINT64")],
            ["t"],
            None,
            [],
        )
    )
    recs = [{"t": i, "v": i} for i in range(20)]
    svc.insert_json_batch("ev", json.dumps(recs).encode())
    assert svc.tables["ev"]._segments  # flushed past the arena limit
    # upsert via a second batch: newest wins on the primary key
    svc.insert_json_batch(
        "ev", json.dumps([{"t": 3, "v": 300}]).encode()
    )
    svc.commit_all()

    reopened = DurableTableService(str(tmp_path))
    rel = reopened.get_table_data("ev")
    got = {}
    ti, vi = rel.names.index("t"), rel.names.index("v")
    for i in range(rel.num_rows):
        got[rel.columns[ti].value_at(i).payload()] = (
            rel.columns[vi].value_at(i).payload()
        )
    assert len(got) == 20
    assert got[3] == 300
    assert got[7] == 7


def test_http_insert_uses_batch_path(tmp_path):
    import urllib.request

    from eventql_tpu.server.http_api import EventQLServer

    server = EventQLServer().start()
    try:
        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{server.port}{path}",
                data=json.dumps(payload).encode(),
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=30) as resp:
                return resp.status, json.loads(resp.read() or b"{}")

        post("/api/v1/tables/create", {
            "table": "ev",
            "schema": {"columns": [
                {"name": "k", "type": "STRING"},
                {"name": "v", "type": "UINT64"}]},
        })
        status, _ = post("/api/v1/tables/insert", [
            {"table": "ev", "data": {"k": "a", "v": 1}},
            {"table": "ev", "data": {"k": "b", "v": 2}},
        ])
        assert status == 201
        assert server.table_service.tables["ev"]._batches
        status, out = post(
            "/api/v1/sql",
            {"query": "select k, sum(v) from ev group by k order by k;"},
        )
        assert out["results"][0]["rows"] == [["a", "1"], ["b", "2"]]
    finally:
        server.stop()


# -- wire-frame records driver (round 3: evql_records_shred) ----------------


def _lenenc_records(records):
    from eventql_tpu.server.native_tcp import write_lenencstr

    return b"".join(write_lenencstr(r) for r in records), len(records)


def _mk_kv():
    return _mk([("k", "STRING"), ("v", "UINT64")], pk=["k"], name="ev")


def test_records_wire_one_pass():
    """insert_records_wire shreds lenenc-framed records natively with
    pk record ids computed in the same pass."""
    svc = _mk_kv()
    recs = [
        b'{"k": "r%d", "v": %d}' % (i, i * 3) for i in range(50)
    ]
    region, count = _lenenc_records(recs)
    n = svc.insert_records_wire("ev", region, count)
    assert n == 50
    rel = svc.get_table_data("ev")
    assert rel.num_rows == 50
    # record ids landed in the arena index (pk = k)
    t = svc.tables["ev"]
    if t.primary_key:
        assert len(t._arena_index) == 50


def test_records_wire_tail_resume_on_row_error():
    """A bad record mid-stream: rows before it stand, the error matches
    the per-record Python path, rows after it never insert (reference
    per-record loop semantics)."""
    svc = _mk_kv()
    recs = [
        b'{"k": "a", "v": 1}',
        b'{"k": "b", "v": 2}',
        b'{"k": "c", "nope": 3}',  # unknown column
        b'{"k": "d", "v": 4}',
    ]
    region, count = _lenenc_records(recs)
    with pytest.raises(RuntimeError_, match="column not found: 'nope'"):
        svc.insert_records_wire("ev", region, count)
    rel = svc.get_table_data("ev")
    assert rel.num_rows == 2  # a, b inserted; c errored; d never ran


def test_records_wire_fallback_value_resumes_python():
    """A value only Python converts (huge int) resumes on the Python
    path at that record and still lands correctly."""
    svc = _mk_kv()
    recs = [
        b'{"k": "a", "v": 1}',
        b'{"k": "b", "v": 1e3}',  # float syntax for uint: python decides
        b'{"k": "c", "v": 3}',
    ]
    region, count = _lenenc_records(recs)
    n = svc.insert_records_wire("ev", region, count)
    rel = svc.get_table_data("ev")
    # whatever the native/python split, the merged result must equal
    # the pure-python per-record path
    svc2 = _mk_kv()
    for r in recs:
        svc2.insert_json("ev", r.decode())
    rel2 = svc2.get_table_data("ev")
    assert rel.num_rows == rel2.num_rows
    for c1, c2 in zip(rel.columns, rel2.columns):
        assert list(c1.valid) == list(c2.valid)
        for i in range(rel.num_rows):
            assert c1.value_at(i).payload() == c2.value_at(i).payload()


def test_records_wire_rid_parity_with_python():
    """Native SHA1 record ids == the Python wire-string ids (replication
    pushes and local inserts must agree on identity)."""
    svc = _mk_kv()
    recs = [b'{"k": "key%d", "v": %d}' % (i, i) for i in range(20)]
    region, count = _lenenc_records(recs)
    svc.insert_records_wire("ev", region, count)
    t = svc.tables["ev"]
    if not t.primary_key:
        return
    rel = svc.get_table_data("ev")
    py_ids = t._batch_record_ids(rel)
    for rid in py_ids:
        assert rid in t._arena_index


def test_insert_json_returns_insert_status():
    """insert_json propagates insert_row's bool so the wire fallback
    path counts fallback rows correctly (advisor round-3 finding:
    a missing `return` made every fallback insert count as 0)."""
    svc = _mk([("id", "uint64"), ("v", "uint64")], pk=["id"])
    assert svc.insert_json("t", json.dumps({"id": 1, "v": 10})) is True
    # same pk with an older explicit version: stale, dropped
    assert (
        svc.insert_json("t", json.dumps({"id": 1, "v": 11}), version=1)
        is False
    )


def test_records_wire_fallback_counts_rows():
    """insert_records_wire's Python-fallback path must count rows it
    inserts (nested-record schemas route around the native shredder)."""
    svc = TableService()
    svc.create_table(
        CreateTableNode(
            "n",
            [
                ColumnDefinition("k", "STRING"),
                ColumnDefinition(
                    "rec", "RECORD",
                    subcolumns=[ColumnDefinition("x", "UINT64")],
                ),
            ],
            [],
            None,
            [],
        )
    )
    recs = [
        json.dumps({"k": f"r{i}", "rec": {"x": i}}).encode()
        for i in range(5)
    ]
    region, count = _lenenc_records(recs)
    n = svc.insert_records_wire("n", region, count)
    assert n == 5


def test_concurrent_wire_ingest_dedup(tmp_path):
    """Parallel connections inserting OVERLAPPING primary keys: the
    per-table write lock serializes arena/version work, and write-time
    dedup must hold exactly (newest version wins, one row per pk)."""
    import json as _json
    import threading

    svc = DurableTableService(str(tmp_path), arena_flush_rows=3000)
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

    def varint(x):
        out = bytearray()
        while True:
            b7 = x & 0x7F
            x >>= 7
            out.append(b7 | (0x80 if x else 0))
            if not x:
                break
        return bytes(out)

    n_keys, per_thread_batches, batch = 4000, 10, 800
    errs = []

    def writer(tid):
        rng = np.random.default_rng(tid)
        try:
            for _ in range(per_thread_batches):
                ks = rng.integers(0, n_keys, batch)
                recs = [
                    _json.dumps({"id": int(k), "v": int(k) * 2}).encode()
                    for k in ks
                ]
                region = b"".join(varint(len(r)) + r for r in recs)
                svc.insert_records_wire("ev", region, batch)
        except Exception as e:
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs

    rel = svc.tables["ev"].to_relation()
    ids = rel.columns[rel.names.index("id")].data.astype(np.uint64)
    vs = rel.columns[rel.names.index("v")].data.astype(np.uint64)
    assert len(np.unique(ids)) == len(ids), "duplicate primary keys"
    assert np.array_equal(vs, ids * 2)
