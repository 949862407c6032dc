"""LSM storage engine tests (reference contract: db/partition_writer.cc
arena→segment commit, compaction, newest-wins primary-key upserts)."""

import os

import pytest

from eventql_tpu.core.errors import SQLError
from eventql_tpu.db.lsm import DurableTableService
from eventql_tpu.exec.runtime import Runtime


def run(svc, query):
    rt = Runtime()
    txn = rt.new_transaction(svc)
    return rt.build_query_plan(txn, query).execute(0)


CREATE = (
    "CREATE TABLE ev (id uint64, name string, score double,"
    " PRIMARY KEY (id));"
)


def test_insert_flush_reopen(tmp_path):
    d = str(tmp_path / "data")
    svc = DurableTableService(d, arena_flush_rows=3)
    run(svc, CREATE)
    for i in range(7):
        run(svc, f"INSERT INTO ev (id, name, score) VALUES ({i}, 'n{i}', {i}.5);")
    # two segments flushed (3+3), one row in arena
    seg_dir = os.path.join(d, "ev")
    segs = [f for f in os.listdir(seg_dir) if f.endswith(".cst")]
    assert len(segs) == 2

    r = run(svc, "select count(1) from ev;")
    assert r.rows == [["7"]]

    svc.commit_all()

    # reopen from disk
    svc2 = DurableTableService(d)
    r = run(svc2, "select id, name, score from ev order by id;")
    assert r.num_rows == 7
    assert r.get_row(3) == ["3", "n3", "3.500000"]


def test_primary_key_upsert(tmp_path):
    d = str(tmp_path / "data")
    svc = DurableTableService(d, arena_flush_rows=2)
    run(svc, CREATE)
    run(svc, "INSERT INTO ev (id, name) VALUES (1, 'old');")
    run(svc, "INSERT INTO ev (id, name) VALUES (2, 'two');")  # flush
    run(svc, "INSERT INTO ev (id, name) VALUES (1, 'new');")
    r = run(svc, "select id, name from ev order by id;")
    assert r.rows == [["1", "new"], ["2", "two"]]

    # upsert survives compaction and reopen
    svc.tables["ev"].compact()
    seg_dir = os.path.join(d, "ev")
    segs = [f for f in os.listdir(seg_dir) if f.endswith(".cst")]
    assert len(segs) == 1
    svc2 = DurableTableService(d)
    r = run(svc2, "select id, name from ev order by id;")
    assert r.rows == [["1", "new"], ["2", "two"]]


def test_alter_add_column_after_flush(tmp_path):
    d = str(tmp_path / "data")
    svc = DurableTableService(d, arena_flush_rows=1)
    run(svc, CREATE)
    run(svc, "INSERT INTO ev (id, name) VALUES (1, 'a');")  # flushed
    run(svc, "ALTER TABLE ev ADD COLUMN extra string;")
    run(svc, "INSERT INTO ev (id, name, extra) VALUES (2, 'b', 'x');")
    r = run(svc, "select id, extra from ev order by id;")
    assert r.rows == [["1", "NULL"], ["2", "x"]]


def test_drop_removes_files(tmp_path):
    d = str(tmp_path / "data")
    svc = DurableTableService(d)
    run(svc, CREATE)
    assert os.path.exists(os.path.join(d, "ev", "table.json"))
    run(svc, "DROP TABLE ev;")
    assert not os.path.exists(os.path.join(d, "ev"))


# -- nested / REPEATED columns on durable tables -----------------------


def _nested_svc(tmp_path, flush=4):
    from eventql_tpu.db.lsm import DurableTableService
    from eventql_tpu.exec.runtime import Runtime

    svc = DurableTableService(str(tmp_path), arena_flush_rows=flush)
    rt = Runtime()
    txn = rt.new_transaction(svc)
    rt.build_query_plan(
        txn,
        "CREATE TABLE ev (id uint64, tags REPEATED string,"
        " events REPEATED RECORD (time uint64, vals REPEATED uint64),"
        " PRIMARY KEY (id));",
    ).execute(0)
    return svc, rt


def _q(svc, rt, sql):
    txn = rt.new_transaction(svc)
    return rt.build_query_plan(txn, sql).execute(0).rows


def test_lsm_nested_flush_and_query(tmp_path):
    svc, rt = _nested_svc(tmp_path, flush=3)
    for i in range(8):  # crosses several segment flushes
        svc.insert_json(
            "ev",
            f'{{"id": {i}, "tags": ["t{i}", "x"],'
            f' "events": [{{"time": {i*10}, "vals": [{i}, {i+1}]}}]}}',
        )
    # row expansion across arena + segments
    assert _q(svc, rt, "select count(tags) from ev;") == [["16"]]
    # WITHIN RECORD over nested repeated
    rows = _q(
        svc, rt, "select id, sum(`events.vals`) WITHIN RECORD from ev"
        " order by id;"
    )
    assert rows == [[str(i), str(2 * i + 1)] for i in range(8)]


def test_lsm_nested_reopen(tmp_path):
    from eventql_tpu.db.lsm import DurableTableService

    svc, rt = _nested_svc(tmp_path, flush=2)
    svc.insert_json("ev", '{"id": 1, "tags": ["a", "b"]}')
    svc.insert_json("ev", '{"id": 2, "tags": ["c"]}')
    svc.commit_all()

    svc2 = DurableTableService(str(tmp_path))
    rows = _q(svc2, rt, "select id, tags from ev order by id;")
    assert rows == [["1", "a"], ["1", "b"], ["2", "c"]]


def test_lsm_nested_upsert_newest_wins(tmp_path):
    svc, rt = _nested_svc(tmp_path, flush=2)
    svc.insert_json("ev", '{"id": 7, "tags": ["old1", "old2", "old3"]}')
    svc.insert_json("ev", '{"id": 8, "tags": ["keep"]}')
    svc.tables["ev"].commit()  # old version now in a segment
    svc.insert_json("ev", '{"id": 7, "tags": ["new"]}')
    rows = _q(svc, rt, "select id, tags from ev order by id, tags;")
    assert rows == [["7", "new"], ["8", "keep"]]
    # count reflects the upserted record only
    assert _q(svc, rt, "select count(tags) from ev;") == [["2"]]


def test_lsm_nested_compaction(tmp_path):
    svc, rt = _nested_svc(tmp_path, flush=2)
    for i in range(9):
        svc.insert_json("ev", f'{{"id": {i % 3}, "tags": ["v{i}"]}}')
    table = svc.tables["ev"]
    assert len(table._segments) >= 2
    table.compact()
    assert len(table._segments) == 1
    # newest version of each of the 3 keys survives (ids 6,7,8 → keys 0,1,2)
    rows = _q(svc, rt, "select id, tags from ev order by id;")
    assert rows == [["0", "v6"], ["1", "v7"], ["2", "v8"]]
