"""Partition metadata, replicated writes, and replica failover
(reference: db/metadata_file.h partition map, table_service.cc
933-1058 majority-ack replica writes, server/sql/scheduler.cc
per-partition keyrange-scoped subqueries)."""

import json

import pytest

from eventql_tpu.config.config_directory import (
    SERVER_UP,
    ConfigDirectory,
    ServerConfig,
)
from eventql_tpu.core.errors import RuntimeError_, SQLError
from eventql_tpu.db.metadata import TableMetadata
from eventql_tpu.db.table_service import TableService
from eventql_tpu.exec.runtime import Runtime
from eventql_tpu.parallel.cluster import cluster_provider_from_config
from eventql_tpu.server.native_tcp import NativeTCPClient, NativeTCPServer


def test_metadata_lookup_and_split():
    meta = TableMetadata.initial("uint64", "t", "ev", ["a", "b"])
    assert meta.lookup(0).servers == ["a", "b"]
    pid = meta.entries[0].partition_id
    meta.split(pid, 100)
    assert len(meta.entries) == 2
    assert meta.lookup(99).partition_id == pid
    assert meta.lookup(100).partition_id != pid
    assert meta.keyrange(pid) == ("", 100)
    assert meta.keyrange(meta.entries[1].partition_id) == (100, "")
    # round-trip
    back = TableMetadata.from_json(meta.to_json())
    assert [e.begin for e in back.entries] == ["", 100]
    with pytest.raises(RuntimeError_):
        meta.split(pid, 500)  # outside [ -inf, 100 )


@pytest.fixture
def cluster3(tmp_path):
    """3 workers registered in a config dir with replication factor 2."""
    cfg = str(tmp_path / "cluster.json")
    cdir = ConfigDirectory(cfg)
    cdir.cluster_create("test", replication_factor=2)
    servers = []
    for i in range(3):
        svc = TableService()
        server = NativeTCPServer(svc, port=0)
        server.query_provider_factory = lambda: cluster_provider_from_config(cfg)
        server.start()
        cdir.update_server_config(
            ServerConfig(f"node{i+1}", f"127.0.0.1:{server.port}", SERVER_UP)
        )
        servers.append(server)
    yield cfg, cdir, servers
    for s in servers:
        s.stop()


def _provider(cfg):
    return cluster_provider_from_config(cfg)


def test_replicated_insert_and_partition_query(cluster3):
    cfg, cdir, servers = cluster3
    p = _provider(cfg)
    rt = Runtime()
    txn = rt.new_transaction(p)
    rt.build_query_plan(
        txn, "CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));"
    ).execute(0)

    # metadata registered: one partition on 2 of 3 servers
    meta = TableMetadata.from_json(
        cdir.get_table_config("default", "ev")["metadata"]
    )
    assert len(meta.entries) == 1
    assert len(meta.entries[0].servers) == 2

    for i in range(20):
        p.insert_json("ev", json.dumps({"t": i, "v": i}))

    # rows landed on BOTH replicas (replication), none on the third
    owners = set(meta.entries[0].servers)
    for i, server in enumerate(servers):
        nrows = server.table_service.get_table_data("ev").num_rows
        if f"node{i+1}" in owners:
            assert nrows == 20
        else:
            assert nrows == 0

    # distributed query returns each row exactly once (no double count)
    txn = rt.new_transaction(p)
    plan = rt.build_query_plan(txn, "select count(1), sum(v) from ev;")
    assert plan.execute(0).rows == [["20", str(sum(range(20)))]]
    p.close()


def test_split_scopes_queries(cluster3):
    cfg, cdir, servers = cluster3
    p = _provider(cfg)
    rt = Runtime()
    txn = rt.new_transaction(p)
    rt.build_query_plan(
        txn, "CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));"
    ).execute(0)
    for i in range(10):
        p.insert_json("ev", json.dumps({"t": i, "v": 1}))

    meta = TableMetadata.from_json(
        cdir.get_table_config("default", "ev")["metadata"]
    )
    meta.split(meta.entries[0].partition_id, 5)
    cdir.update_table_config("default", "ev", {"metadata": meta.to_json()})

    # two partitions now; query still counts every row exactly once
    p2 = _provider(cfg)
    txn = rt.new_transaction(p2)
    plan = rt.build_query_plan(txn, "select count(1) from ev;")
    assert plan.execute(0).rows == [["10"]]

    # inserts after the split route by the new ranges (a NEW key —
    # re-inserting an existing pk is an upsert and wouldn't change the
    # count, matching the reference's record-version semantics)
    p2.insert_json("ev", json.dumps({"t": 27, "v": 1}))
    txn = rt.new_transaction(p2)
    assert rt.build_query_plan(txn, "select count(1) from ev;").execute(
        0
    ).rows == [["11"]]
    # and an existing-pk insert upserts in place: count unchanged
    p2.insert_json("ev", json.dumps({"t": 7, "v": 9}))
    txn = rt.new_transaction(p2)
    assert rt.build_query_plan(txn, "select count(1) from ev;").execute(
        0
    ).rows == [["11"]]
    p.close()
    p2.close()


def test_replica_failover(cluster3):
    cfg, cdir, servers = cluster3
    p = _provider(cfg)
    rt = Runtime()
    txn = rt.new_transaction(p)
    rt.build_query_plan(
        txn, "CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));"
    ).execute(0)
    for i in range(12):
        p.insert_json("ev", json.dumps({"t": i, "v": 2}))

    meta = TableMetadata.from_json(
        cdir.get_table_config("default", "ev")["metadata"]
    )
    first_owner = meta.entries[0].servers[0]
    idx = int(first_owner[len("node") :]) - 1
    servers[idx].stop()  # kill the primary replica

    # queries fail over to the surviving replica: full results
    p2 = _provider(cfg)
    txn = rt.new_transaction(p2)
    plan = rt.build_query_plan(txn, "select count(1), sum(v) from ev;")
    assert plan.execute(0).rows == [["12", "24"]]

    # writes still meet majority (1 of 2 required)
    p2.insert_json("ev", json.dumps({"t": 100, "v": 2}))
    txn = rt.new_transaction(p2)
    assert rt.build_query_plan(txn, "select count(1) from ev;").execute(
        0
    ).rows == [["13"]]
    p.close()
    p2.close()


def test_insert_missing_pk_errors(cluster3):
    cfg, cdir, servers = cluster3
    p = _provider(cfg)
    rt = Runtime()
    txn = rt.new_transaction(p)
    rt.build_query_plan(
        txn, "CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));"
    ).execute(0)
    with pytest.raises(SQLError, match="missing field: t"):
        p.insert_json("ev", json.dumps({"v": 5}))
    p.close()


def test_pushdown_topk(cluster3):
    """Distributed ORDER BY ... LIMIT: workers return top candidates per
    partition; the coordinator merges, re-sorts, and slices."""
    cfg, cdir, servers = cluster3
    p = _provider(cfg)
    rt = Runtime()
    txn = rt.new_transaction(p)
    rt.build_query_plan(
        txn, "CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));"
    ).execute(0)
    for i in range(50):
        p.insert_json("ev", json.dumps({"t": i, "v": (i * 37) % 101}))
    # split so the top-k spans partitions
    meta = TableMetadata.from_json(
        cdir.get_table_config("default", "ev")["metadata"]
    )
    meta.split(meta.entries[0].partition_id, 25)
    cdir.update_table_config("default", "ev", {"metadata": meta.to_json()})

    p2 = _provider(cfg)
    txn = rt.new_transaction(p2)
    plan = rt.build_query_plan(
        txn, "select t, v from ev order by v desc limit 5;"
    )
    got = plan.execute(0).rows
    vals = sorted(((i * 37) % 101, i) for i in range(50))[::-1][:5]
    assert got == [[str(i), str(v)] for v, i in vals]

    # offset + limit
    txn = rt.new_transaction(p2)
    plan = rt.build_query_plan(
        txn, "select v from ev order by v desc limit 3 offset 4;"
    )
    expect = sorted(((i * 37) % 101) for i in range(50))[::-1][4:7]
    assert plan.execute(0).rows == [[str(v)] for v in expect]
    p.close()
    p2.close()


def test_replication_repair_catches_up(cluster3):
    """A replica that missed writes while down converges via the
    anti-entropy pull (reference: db/replication_worker.cc role)."""
    from eventql_tpu.db.replication import ReplicationWorker
    from eventql_tpu.server.native_tcp import NativeTCPServer

    cfg, cdir, servers = cluster3
    p = _provider(cfg)
    rt = Runtime()
    txn = rt.new_transaction(p)
    rt.build_query_plan(
        txn, "CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));"
    ).execute(0)

    from eventql_tpu.db.metadata import TableMetadata

    meta = TableMetadata.from_json(
        cdir.get_table_config("default", "ev")["metadata"]
    )
    owners = meta.entries[0].servers
    victim_id = owners[1]
    vidx = int(victim_id[len("node") :]) - 1
    victim = servers[vidx]
    victim_svc = victim.table_service
    victim_port = victim.port
    victim.stop()  # replica goes down
    p.close()  # drop pooled connections so the failure is visible

    p = _provider(cfg)
    for i in range(15):
        p.insert_json("ev", json.dumps({"t": i, "v": i * 2}))
    assert victim_svc.get_table_data("ev").num_rows == 0

    # replica comes back on the same port and repairs
    revived = NativeTCPServer(victim_svc, port=victim_port).start()
    try:
        worker = ReplicationWorker(victim_svc, cfg, victim_id, interval=999)
        repaired = worker.repair_once()
        assert repaired == 15
        assert victim_svc.get_table_data("ev").num_rows == 15
        # idempotent: a second sweep repairs nothing
        assert worker.repair_once() == 0
        # totals via the revived replica alone match
        txn = rt.new_transaction(p)
        rows = rt.build_query_plan(
            txn, "select count(1), sum(v) from ev;"
        ).execute(0).rows
        assert rows == [["15", str(sum(i * 2 for i in range(15)))]]
    finally:
        revived.stop()
    p.close()


def test_rebalance_backfills_new_replica(cluster3):
    """Removing an owner + rebalance reassigns the partition to another
    live server; its repair sweep pulls the data (db/rebalance.cc flow)."""
    from eventql_tpu.db.rebalance import rebalance
    from eventql_tpu.db.replication import ReplicationWorker

    cfg, cdir, servers = cluster3
    p = _provider(cfg)
    rt = Runtime()
    txn = rt.new_transaction(p)
    rt.build_query_plan(
        txn, "CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));"
    ).execute(0)
    for i in range(10):
        p.insert_json("ev", json.dumps({"t": i, "v": 5}))

    from eventql_tpu.db.metadata import TableMetadata

    meta = TableMetadata.from_json(
        cdir.get_table_config("default", "ev")["metadata"]
    )
    old_owners = list(meta.entries[0].servers)
    departed = old_owners[0]
    cdir.remove_server(departed)

    changes = rebalance(cdir)
    assert any("removed placement" in c for c in changes)
    assert any("added replica" in c for c in changes)

    meta2 = TableMetadata.from_json(
        cdir.get_table_config("default", "ev")["metadata"]
    )
    new_owners = meta2.entries[0].servers
    assert departed not in new_owners
    assert len(new_owners) == 2

    # the newly placed replica backfills via repair
    newcomer = [s for s in new_owners if s not in old_owners][0]
    nidx = int(newcomer[len("node") :]) - 1
    worker = ReplicationWorker(
        servers[nidx].table_service, cfg, newcomer, interval=999
    )
    assert worker.repair_once() == 10
    assert servers[nidx].table_service.get_table_data("ev").num_rows == 10

    # queries through a fresh coordinator see consistent data
    p2 = _provider(cfg)
    txn = rt.new_transaction(p2)
    rows = rt.build_query_plan(txn, "select count(1), sum(v) from ev;").execute(0).rows
    assert rows == [["10", "50"]]
    p.close()
    p2.close()


def test_describe_partitions_cluster(cluster3):
    cfg, cdir, servers = cluster3
    p = _provider(cfg)
    rt = Runtime()
    txn = rt.new_transaction(p)
    rt.build_query_plan(
        txn, "CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));"
    ).execute(0)
    from eventql_tpu.db.metadata import TableMetadata

    meta = TableMetadata.from_json(
        cdir.get_table_config("default", "ev")["metadata"]
    )
    meta.split(meta.entries[0].partition_id, 100)
    cdir.update_table_config("default", "ev", {"metadata": meta.to_json()})

    p2 = _provider(cfg)
    txn = rt.new_transaction(p2)
    r = rt.build_query_plan(txn, "describe partitions ev;").execute(0)
    assert r.num_rows == 2
    # each row: partition_id, comma-joined servers
    for row in r.rows:
        assert len(row[0]) == 20
        assert row[1].count("node") == 2
    p.close()
    p2.close()


def test_monitor_publishes_load(cluster3, tmp_path):
    from eventql_tpu.db.monitor import Monitor

    cfg, cdir, servers = cluster3
    p = _provider(cfg)
    rt = Runtime()
    txn = rt.new_transaction(p)
    rt.build_query_plan(
        txn, "CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));"
    ).execute(0)
    p.insert_json("ev", json.dumps({"t": 1, "v": 1}))

    mon = Monitor(
        servers[0].table_service, cfg, "node1",
        f"127.0.0.1:{servers[0].port}",
    )
    mon.publish_once()
    s = cdir.get_server_config("node1")
    assert s.load_partitions >= 1
    p.close()


def test_tolerate_failed_shards_partial_results(cluster3):
    """With every replica of a partition down, the default tolerate
    policy returns partial results and counts the failed shard
    (reference: query_failed_shard_policy=tolerate, evqld.cc:247)."""
    cfg, cdir, servers = cluster3
    p = _provider(cfg)
    rt = Runtime()
    txn = rt.new_transaction(p)
    rt.build_query_plan(
        txn, "CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));"
    ).execute(0)
    for i in range(10):
        p.insert_json("ev", json.dumps({"t": i, "v": 1}))

    # split: [0, 5) and [5, inf)
    from eventql_tpu.db.metadata import TableMetadata

    meta = TableMetadata.from_json(
        cdir.get_table_config("default", "ev")["metadata"]
    )
    meta.split(meta.entries[0].partition_id, 5)
    # place the SECOND partition only on node3, then kill node3
    meta.entries[1].servers = ["node3"]
    cdir.update_table_config("default", "ev", {"metadata": meta.to_json()})
    servers[2].stop()

    p2 = _provider(cfg)
    txn = rt.new_transaction(p2)
    rows = rt.build_query_plan(txn, "select count(1) from ev;").execute(0).rows
    assert rows == [["5"]]  # partial: only the live partition
    assert p2.num_failed_shards == 1

    # strict policy raises instead
    p3 = _provider(cfg)
    p3.failed_shard_policy = "strict"
    txn = rt.new_transaction(p3)
    with pytest.raises(SQLError, match="no live replica"):
        rt.build_query_plan(txn, "select count(1) from ev;").execute(0)
    p.close()
    p2.close()
    p3.close()


def test_leader_election_and_failover(cluster3, tmp_path):
    """One leader at a time via the registry lock; leadership fails over
    on release; the leader's pass runs rebalance (db/leader.cc flow)."""
    from eventql_tpu.db.leader import Leader

    cfg, cdir, servers = cluster3
    l1 = Leader(cfg, "node1")
    l2 = Leader(cfg, "node2")
    assert l1.try_acquire()
    assert not l2.try_acquire()
    assert l1.is_leader and not l2.is_leader

    # leader duty = rebalance: under-replicated placement gets fixed
    p = _provider(cfg)
    rt = Runtime()
    txn = rt.new_transaction(p)
    rt.build_query_plan(
        txn, "CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));"
    ).execute(0)
    from eventql_tpu.db.metadata import TableMetadata

    meta = TableMetadata.from_json(
        cdir.get_table_config("default", "ev")["metadata"]
    )
    meta.entries[0].servers = meta.entries[0].servers[:1]  # under-replicated
    cdir.update_table_config("default", "ev", {"metadata": meta.to_json()})

    l1.run_leader_duties()
    meta2 = TableMetadata.from_json(
        cdir.get_table_config("default", "ev")["metadata"]
    )
    assert len(meta2.entries[0].servers) == 2  # backfilled to RF

    l1.release()
    assert l2.try_acquire()
    l2.release()
    p.close()


def test_gc_trash_sweep(tmp_path):
    import os

    from eventql_tpu.db.lsm import DurableTableService, collect_garbage

    svc = DurableTableService(str(tmp_path), arena_flush_rows=2)
    rt = Runtime()
    txn = rt.new_transaction(svc)
    rt.build_query_plan(
        txn, "CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));"
    ).execute(0)
    for i in range(8):
        svc.insert_json("ev", json.dumps({"t": i, "v": i}))
    table = svc.tables["ev"]
    nsegs = len(table._segments)
    assert nsegs >= 3
    table.compact()
    trash = os.path.join(str(tmp_path), "ev", ".trash")
    # superseded segments AND their pk-version index files trashed
    trashed = os.listdir(trash)
    assert len([f for f in trashed if f.endswith(".cst")]) == nsegs
    removed = collect_garbage(str(tmp_path))
    assert removed == len(trashed)
    assert os.listdir(trash) == []
    # data intact after GC
    txn = rt.new_transaction(svc)
    assert rt.build_query_plan(txn, "select count(1) from ev;").execute(
        0
    ).rows == [["8"]]


def test_shredded_record_list_roundtrip():
    """Exact wire format (reference: db/shredded_record.cc:82-136)."""
    from eventql_tpu.db.shredded_record_list import (
        ShreddedColumn,
        ShreddedRecordList,
    )

    lst = ShreddedRecordList(
        record_ids=[bytes(range(20)), bytes(range(20, 40))],
        record_versions=[1, 300],
        columns=[
            ShreddedColumn("k", [(1, 0, b"a"), (0, 0, b"")]),
            ShreddedColumn("v", [(1, 0, b"5"), (1, 0, b"2.5")]),
        ],
    )
    buf = lst.encode()
    assert buf[0] == 0x01
    back = ShreddedRecordList.decode(buf)
    assert back == lst


def test_repl_insert_op_and_push_repair(cluster3):
    """Push-based anti-entropy over EVQL_OP_REPL_INSERT: a replica that
    holds rows a peer is missing pushes them as a ShreddedRecordList
    (reference: db/partition_replication.cc push offers +
    transport/native/ops/repl_insert.cc)."""
    from eventql_tpu.db.replication import ReplicationWorker

    cfg, cdir, servers = cluster3
    p = _provider(cfg)
    rt = Runtime()
    txn = rt.new_transaction(p)
    rt.build_query_plan(
        txn,
        "CREATE TABLE pev (t uint64, v uint64, s string, PRIMARY KEY (t));",
    ).execute(0)
    meta = TableMetadata.from_json(
        cdir.get_table_config("default", "pev")["metadata"]
    )
    owners = meta.entries[0].servers
    first = int(owners[0].replace("node", "")) - 1
    second = int(owners[1].replace("node", "")) - 1

    # rows land ONLY on the first replica's local store (simulating
    # writes the second replica missed while down)
    for i in range(12):
        servers[first].table_service.insert_json(
            "pev", json.dumps({"t": i, "v": i, "s": f"x{i}"})
        )
    assert servers[second].table_service.get_table_data("pev").num_rows == 0

    worker = ReplicationWorker(
        servers[first].table_service, cfg, owners[0]
    )
    pushed = worker.push_once()
    assert pushed == 12
    rel = servers[second].table_service.get_table_data("pev")
    assert rel.num_rows == 12
    vi = rel.names.index("v")
    si = rel.names.index("s")
    got = {
        rel.columns[rel.names.index("t")].value_at(i).payload(): (
            rel.columns[vi].value_at(i).payload(),
            rel.columns[si].value_at(i).payload(),
        )
        for i in range(rel.num_rows)
    }
    assert got == {i: (i, f"x{i}".encode()) for i in range(12)}

    # idempotent: a second sweep pushes nothing
    assert worker.push_once() == 0


def test_push_repair_big_uint64_keys_lossless(cluster3):
    """Keys above 2^53 must survive the push path exactly — the wire
    strings re-type via int(), not the insert path's float() coercion
    (a float round-trip would corrupt the key and anti-entropy would
    re-push the same rows forever)."""
    from eventql_tpu.db.replication import ReplicationWorker

    cfg, cdir, servers = cluster3
    p = _provider(cfg)
    rt = Runtime()
    txn = rt.new_transaction(p)
    rt.build_query_plan(
        txn, "CREATE TABLE big (t uint64, v uint64, PRIMARY KEY (t));"
    ).execute(0)
    meta = TableMetadata.from_json(
        cdir.get_table_config("default", "big")["metadata"]
    )
    owners = meta.entries[0].servers
    first = int(owners[0].replace("node", "")) - 1
    second = int(owners[1].replace("node", "")) - 1

    big = (1 << 53) + 1
    servers[first].table_service.insert_json(
        "big", json.dumps({"t": big, "v": 7})
    )
    worker = ReplicationWorker(servers[first].table_service, cfg, owners[0])
    assert worker.push_once() == 1
    rel = servers[second].table_service.get_table_data("big")
    assert rel.columns[rel.names.index("t")].value_at(0).payload() == big
    # converged: nothing left to push
    assert worker.push_once() == 0
