"""Primary-key version index tests: insert-time stale-record drops,
per-segment index files, replayed-replication no-ops (reference:
db/partition_writer.cc:105-199, db/tablet_index.h:33-48,
db/tablet_index_cache.h:33-48)."""

import hashlib
import os
import tempfile

import numpy as np
import pytest

from eventql_tpu.db.lsm import DurableTableService
from eventql_tpu.db.table_service import TableService
from eventql_tpu.db.tablet_index import (
    TabletIndex,
    TabletIndexCache,
    next_record_version,
    next_record_version_block,
    write_index,
)
from eventql_tpu.exec.runtime import Runtime


def _rows(svc, sql="select k, v from t;"):
    rt = Runtime()
    txn = rt.new_transaction(svc)
    return rt.build_query_plan(txn, sql).execute(0).rows


def _setup(svc):
    rt = Runtime()
    txn = rt.new_transaction(svc)
    rt.build_query_plan(
        txn, "CREATE TABLE t (k uint64, v uint64, PRIMARY KEY (k));"
    ).execute(0)


# -- index file format -------------------------------------------------------


def test_index_write_load_lookup(tmp_path):
    ids = {hashlib.sha1(bytes([i])).digest(): 100 + i for i in range(50)}
    path = str(tmp_path / "seg.cst.idx")
    write_index(path, ids)
    # 28-byte slots, reference tablet_index.h:56
    assert os.path.getsize(path) == 50 * 28
    idx = TabletIndex.load(path)
    rec_ids = list(ids)
    head = np.zeros(len(rec_ids), np.uint64)
    out = idx.lookup_max(rec_ids, head)
    assert [int(v) for v in out] == [ids[r] for r in rec_ids]
    # absent ids stay at their incoming head version
    other = [hashlib.sha1(b"absent%d" % i).digest() for i in range(5)]
    out = idx.lookup_max(other, np.full(5, 7, np.uint64))
    assert [int(v) for v in out] == [7] * 5
    # incoming head higher than the index wins
    out = idx.lookup_max(rec_ids[:3], np.full(3, 10**6, np.uint64))
    assert [int(v) for v in out] == [10**6] * 3


def test_index_cache_lru_eviction(tmp_path):
    cache = TabletIndexCache(max_bytes=28 * 60)  # fits one 50-entry index
    for name in ("a", "b"):
        write_index(
            str(tmp_path / f"{name}.idx"),
            {hashlib.sha1(f"{name}{i}".encode()).digest(): i + 1
             for i in range(50)},
        )
    a = cache.lookup(str(tmp_path / "a.idx"))
    assert a is not None and len(a.ids) == 50
    b = cache.lookup(str(tmp_path / "b.idx"))
    assert b is not None
    # a evicted (budget), missing files → None
    assert cache.lookup(str(tmp_path / "missing.idx")) is None


def test_version_block_monotone():
    a = next_record_version()
    base = next_record_version_block(10)
    assert base > a
    b = next_record_version()
    assert b >= base + 10


# -- insert-time semantics ---------------------------------------------------


@pytest.mark.parametrize("tier", ["memory", "lsm"])
def test_upsert_newest_wins(tier):
    svc = (
        TableService()
        if tier == "memory"
        else DurableTableService(tempfile.mkdtemp())
    )
    _setup(svc)
    svc.insert_json("t", '{"k": 1, "v": 10}')
    svc.insert_json("t", '{"k": 1, "v": 20}')
    assert _rows(svc) == [["1", "20"]]


def test_stale_version_dropped_at_write():
    svc = DurableTableService(tempfile.mkdtemp())
    _setup(svc)
    svc.insert_json("t", '{"k": 1, "v": 5}')
    t = svc.tables["t"]
    t.commit()
    # segment index file written next to the segment
    assert any(f.endswith(".idx") for f in os.listdir(t.dir))
    # a stale replay (old version) is dropped at WRITE time: no arena row
    svc.insert_json("t", '{"k": 1, "v": 999}', version=1)
    assert t.arena_rows() == 0
    assert _rows(svc) == [["1", "5"]]
    # fresh upsert still lands, and compaction carries the index forward
    svc.insert_json("t", '{"k": 1, "v": 7}')
    t.compact()
    svc.insert_json("t", '{"k": 1, "v": 888}', version=2)
    assert t.arena_rows() == 0
    assert _rows(svc) == [["1", "7"]]


def test_segment_dedup_bounded_after_flush_upserts():
    """Upserting the same key across flushes leaves at most one row per
    segment; a same-arena upsert flushes a single (newest) row."""
    svc = DurableTableService(tempfile.mkdtemp())
    _setup(svc)
    t = svc.tables["t"]
    svc.insert_json("t", '{"k": 1, "v": 1}')
    svc.insert_json("t", '{"k": 1, "v": 2}')
    t.commit()
    seg_rel = t._read_segment(t._segments[0])
    assert seg_rel.num_rows == 1  # arena deduped at flush
    assert _rows(svc) == [["1", "2"]]


def test_replayed_repl_insert_is_noop():
    """A replayed EVQL_OP_REPL_INSERT batch drops entirely at write
    time (VERDICT item 5's done-criterion)."""
    from eventql_tpu.db.shredded_record_list import from_relation
    from eventql_tpu.server.native_tcp import (
        NativeTCPClient,
        NativeTCPServer,
    )

    svc = DurableTableService(tempfile.mkdtemp())
    _setup(svc)
    server = NativeTCPServer(svc, port=0).start()
    try:
        c = NativeTCPClient("127.0.0.1", server.port)
        # source relation with explicit versions, as a push replica sends
        svc2 = TableService()
        _setup(svc2)
        for i in range(10):
            svc2.insert_json("t", '{"k": %d, "v": %d}' % (i, i * 2))
        rel = svc2.get_table_data("t")
        records = from_relation(rel, pk_names=["k"])
        records.record_versions = [
            1000 + i for i in range(len(records.record_ids))
        ]
        c.repl_insert("t", "p1", records)
        t = svc.tables["t"]
        assert t.arena_rows() == 10
        assert len(_rows(svc)) == 10
        # replay: identical versions → every record drops at write time
        c.repl_insert("t", "p1", records)
        assert t.arena_rows() == 10  # no dead rows accumulated
        # replay after flush: segment index catches it too
        t.commit()
        c.repl_insert("t", "p1", records)
        assert t.arena_rows() == 0
        assert len(_rows(svc)) == 10
        # a genuinely newer version still updates
        records.record_versions = [2000] * len(records.record_ids)
        c.repl_insert("t", "p1", records)
        assert t.arena_rows() == 10
        c.close()
    finally:
        server.stop()


def test_lsm_reopen_keeps_index_effective():
    """Indexes are files: a reopened table still drops stale replays."""
    d = tempfile.mkdtemp()
    svc = DurableTableService(d)
    _setup(svc)
    svc.insert_json("t", '{"k": 3, "v": 30}', version=5000)
    svc.tables["t"].commit()

    svc2 = DurableTableService(d)
    t2 = svc2.tables["t"]
    svc2.insert_json("t", '{"k": 3, "v": 31}', version=5000)  # replay
    assert t2.arena_rows() == 0
    svc2.insert_json("t", '{"k": 3, "v": 32}', version=5001)  # newer
    assert t2.arena_rows() == 1
    assert _rows(svc2) == [["3", "32"]]
