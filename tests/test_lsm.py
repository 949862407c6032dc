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
