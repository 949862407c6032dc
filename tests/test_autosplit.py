"""Automatic partition splitting (reference: needsSplit/commitSplit,
db/partition_writer.cc:459-589)."""

import json

import pytest

from eventql_tpu.config.config_directory import ConfigDirectory
from eventql_tpu.db.autosplit import AutoSplitWorker, run_once
from eventql_tpu.db.metadata import TableMetadata
from eventql_tpu.db.table_service import TableService
from eventql_tpu.exec.runtime import Runtime


def _setup(tmp_path, keyspace="uint64", pk="t"):
    svc = TableService()
    rt = Runtime()
    txn = rt.new_transaction(svc)
    rt.build_query_plan(
        txn,
        "CREATE TABLE ev (t uint64, dim string, v uint64, PRIMARY KEY (t));",
    ).execute(0)
    cdir = ConfigDirectory(str(tmp_path / "registry.json"))
    cdir.cluster_create()
    meta = TableMetadata.initial(keyspace, pk, "ev", ["s1"])
    cdir.update_table_config("default", "ev", {"metadata": meta.to_json()})
    return svc, cdir


def _insert(svc, rows):
    for t, dim, v in rows:
        svc.insert_json("ev", json.dumps({"t": t, "dim": dim, "v": v}))


def _meta(cdir):
    return TableMetadata.from_json(
        cdir.get_table_config("default", "ev")["metadata"]
    )


def test_split_at_median(tmp_path):
    svc, cdir = _setup(tmp_path)
    _insert(svc, [(i, "a", i) for i in range(20)])

    changes = run_once(svc, cdir, threshold_rows=10)
    assert len(changes) == 1 and "split at" in changes[0]
    meta = _meta(cdir)
    assert len(meta.entries) == 2
    assert meta.entries[1].begin == 10  # median of 0..19
    # routing: keys below/above the midpoint land in different partitions
    assert meta.lookup(9).partition_id == meta.entries[0].partition_id
    assert meta.lookup(10).partition_id == meta.entries[1].partition_id
    # replicas carry over to the new partition
    assert meta.entries[1].servers == ["s1"]


def test_below_threshold_no_split(tmp_path):
    svc, cdir = _setup(tmp_path)
    _insert(svc, [(i, "a", i) for i in range(10)])
    assert run_once(svc, cdir, threshold_rows=10) == []
    assert len(_meta(cdir).entries) == 1


def test_repeated_passes_converge(tmp_path):
    svc, cdir = _setup(tmp_path)
    _insert(svc, [(i, "a", i) for i in range(40)])
    run_once(svc, cdir, threshold_rows=10)
    run_once(svc, cdir, threshold_rows=10)
    run_once(svc, cdir, threshold_rows=10)
    meta = _meta(cdir)
    # every partition now holds <= 10 rows
    begins = [e.begin for e in meta.entries]
    assert begins == sorted(begins, key=lambda b: (b != "", b))
    for e in meta.entries:
        begin, end = meta.keyrange(e.partition_id)
        lo = 0 if begin == "" else begin
        hi = 40 if end == "" else end
        assert hi - lo <= 10
    # a further pass is a no-op
    assert run_once(svc, cdir, threshold_rows=10) == []


def test_single_key_partition_never_splits(tmp_path):
    svc, cdir = _setup(tmp_path)
    _insert(svc, [(7, "a", i) for i in range(25)])
    assert run_once(svc, cdir, threshold_rows=10) == []
    assert len(_meta(cdir).entries) == 1


def test_string_keyspace_split(tmp_path):
    svc = TableService()
    rt = Runtime()
    txn = rt.new_transaction(svc)
    rt.build_query_plan(
        txn,
        "CREATE TABLE ev (t string, dim string, v uint64, PRIMARY KEY (t));",
    ).execute(0)
    cdir = ConfigDirectory(str(tmp_path / "registry.json"))
    cdir.cluster_create()
    meta = TableMetadata.initial("string", "t", "ev", ["s1"])
    cdir.update_table_config("default", "ev", {"metadata": meta.to_json()})
    _insert(svc, [(chr(ord("a") + i % 26) + str(i), "x", i) for i in range(30)])

    changes = run_once(svc, cdir, threshold_rows=10)
    assert len(changes) == 1
    meta = _meta(cdir)
    assert len(meta.entries) == 2
    assert isinstance(meta.entries[1].begin, str)


def test_worker_respects_leadership(tmp_path):
    class NotLeader:
        is_leader = False  # Leader.is_leader is a property (db/leader.py:35)

    svc, cdir = _setup(tmp_path)
    _insert(svc, [(i, "a", i) for i in range(20)])
    w = AutoSplitWorker(
        svc, str(tmp_path / "registry.json"), leader=NotLeader(),
        threshold_rows=10,
    )
    assert w.run_once() == []
    assert len(_meta(cdir).entries) == 1
