"""The versioned METADATA tier running over the native protocol.

Reference behavior under test: every table carries a chain of immutable
METADATA transaction files stored on N metadata servers; the
coordination service holds only the head pointer, advanced by CAS
(reference: db/metadata_coordinator.cc:43-140,
transport/native/ops/meta_*.cc, doc/internals/partitioning.txt §5).
Here the chains live on real NativeTCPServer instances and every file
operation crosses the wire as a META_* frame.
"""

import json

import pytest

from eventql_tpu.config.config_directory import (
    SERVER_UP,
    ConfigDirectory,
    ServerConfig,
)
from eventql_tpu.core.errors import RuntimeError_
from eventql_tpu.db.metadata_file import (
    METAOP_SPLIT_PARTITION,
    MetadataFile,
    MetadataOperation,
)
from eventql_tpu.db.metadata_service import (
    MetadataCoordinator,
    MetadataService,
    MetadataStore,
)
from eventql_tpu.db.metadata_transport import (
    MetadataServiceProxy,
    make_coordinator,
    remote_factory_from_cdir,
)
from eventql_tpu.db.table_service import TableService
from eventql_tpu.exec.runtime import Runtime
from eventql_tpu.parallel.cluster import cluster_provider_from_config
from eventql_tpu.server.native_tcp import NativeTCPServer


@pytest.fixture
def meta_cluster(tmp_path):
    """3 workers, each hosting a MetadataService on its own datadir."""
    cfg = str(tmp_path / "cluster.json")
    cdir = ConfigDirectory(cfg)
    cdir.cluster_create("test", replication_factor=2)
    servers = []
    for i in range(3):
        store = MetadataStore(str(tmp_path / f"node{i + 1}"))
        svc = TableService()
        server = NativeTCPServer(
            svc, port=0, metadata_service=MetadataService(store)
        )
        server.query_provider_factory = lambda: cluster_provider_from_config(
            cfg
        )
        server.start()
        cdir.update_server_config(
            ServerConfig(f"node{i + 1}", f"127.0.0.1:{server.port}", SERVER_UP)
        )
        servers.append(server)
    yield cfg, cdir, servers
    for s in servers:
        s.stop()


def _create_table(cfg):
    p = cluster_provider_from_config(cfg)
    rt = Runtime()
    txn = rt.new_transaction(p)
    rt.build_query_plan(
        txn, "CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));"
    ).execute(0)
    return p, rt


def test_create_table_stores_chain_on_metadata_servers(meta_cluster):
    cfg, cdir, servers = meta_cluster
    p, _rt = _create_table(cfg)

    tcfg = cdir.get_table_config("default", "ev")
    assert tcfg["metadata_txnid"]
    assert tcfg["metadata_txnseq"] == 1
    assert tcfg["metadata_servers"] == ["node1", "node2"]
    # derived routing view matches the chain head
    assert len(tcfg["metadata"]["partitions"]) == 1
    assert tcfg["metadata"]["partitions"][0]["servers"] == ["node1", "node2"]

    # the seq-1 file is durably stored on both metadata servers and
    # readable over META_GETFILE
    for i in (0, 1):
        proxy = MetadataServiceProxy("127.0.0.1", servers[i].port)
        f = proxy.get_file("default", "ev", tcfg["metadata_txnid"])
        assert f.seq == 1
        assert [pl.server_id for pl in f.entries[0].servers] == [
            "node1",
            "node2",
        ]
        proxy.close()
    p.close()


def test_cas_split_over_the_wire(meta_cluster):
    cfg, cdir, servers = meta_cluster
    p, rt = _create_table(cfg)
    tcfg = cdir.get_table_config("default", "ev")
    pid = tcfg["metadata"]["partitions"][0]["partition_id"]

    coord = make_coordinator(cdir)
    op = MetadataOperation(
        "default",
        "ev",
        METAOP_SPLIT_PARTITION,
        {
            "partition_id": pid,
            "split_point": 100,
            "split_partition_id_low": "l" * 20,
            "split_partition_id_high": "h" * 20,
            "split_servers_low": ["node1", "node2"],
            "split_servers_high": ["node1", "node2"],
            "finalize_immediately": True,
        },
        input_txnid=tcfg["metadata_txnid"],
    )
    out = coord.perform_and_commit_operation("default", "ev", op)
    assert out.seq == 2

    tcfg2 = cdir.get_table_config("default", "ev")
    assert tcfg2["metadata_txnid"] == op.output_txnid
    assert [e["begin"] for e in tcfg2["metadata"]["partitions"]] == ["", 100]

    # a CAS against the stale head loses with the reference's error text
    stale = MetadataOperation(
        "default",
        "ev",
        METAOP_SPLIT_PARTITION,
        {
            "partition_id": "l" * 20,
            "split_point": 50,
            "split_partition_id_low": "x" * 20,
            "split_partition_id_high": "y" * 20,
            "split_servers_low": ["node1"],
            "split_servers_high": ["node1"],
            "finalize_immediately": True,
        },
        input_txnid=tcfg["metadata_txnid"],  # stale
    )
    with pytest.raises(RuntimeError_, match="concurrent modification"):
        coord.perform_and_commit_operation("default", "ev", stale)
    p.close()


def test_discovery_served_over_the_wire(meta_cluster):
    cfg, cdir, servers = meta_cluster
    p, _rt = _create_table(cfg)
    tcfg = cdir.get_table_config("default", "ev")
    pid = tcfg["metadata"]["partitions"][0]["partition_id"]

    proxy = MetadataServiceProxy("127.0.0.1", servers[0].port)
    resp = proxy.discover(
        "default",
        "ev",
        tcfg["metadata_txnseq"],
        {"requester_id": "node1", "partition_id": pid, "lookup_by_id": True},
    )
    assert resp.code == "SERVE"
    # a serving replica pushes to its peer replicas
    assert {t.server_id for t in resp.replication_targets} == {"node2"}

    resp2 = proxy.discover(
        "default",
        "ev",
        tcfg["metadata_txnseq"],
        {"requester_id": "node3", "partition_id": pid, "lookup_by_id": True},
    )
    assert resp2.code == "UNLOAD"
    proxy.close()
    p.close()


def test_list_and_find_partition_rpcs(meta_cluster):
    cfg, cdir, servers = meta_cluster
    p, _rt = _create_table(cfg)

    from eventql_tpu.server import native_tcp as nt
    from eventql_tpu.server.native_tcp import NativeTCPClient

    c = NativeTCPClient("127.0.0.1", servers[0].port)
    listing = c.meta_request(
        nt.OP_META_LISTPARTITIONS, {"db": "default", "table": "ev"}
    )
    assert len(listing["partitions"]) == 1
    found = c.meta_request(
        nt.OP_META_FINDPARTITION, {"db": "default", "table": "ev", "key": 42}
    )
    assert found["partition_id"] == listing["partitions"][0]["partition_id"]
    assert found["servers"] == ["node1", "node2"]
    c.close()
    p.close()


def test_majority_tolerates_one_dead_metadata_server(meta_cluster):
    cfg, cdir, servers = meta_cluster
    p, _rt = _create_table(cfg)
    tcfg = cdir.get_table_config("default", "ev")
    pid = tcfg["metadata"]["partitions"][0]["partition_id"]

    # three metadata servers for this op's table: re-create the chain
    # across all 3, then kill one — CAS ops must still commit (majority)
    f = MetadataFile.initial("uint64", "t", "ev3", ["node1", "node2", "node3"])
    coord = make_coordinator(cdir)
    coord.create_file("default", "ev3", f, ["node1", "node2", "node3"])
    servers[2].stop()

    op = MetadataOperation(
        "default",
        "ev3",
        METAOP_SPLIT_PARTITION,
        {
            "partition_id": f.entries[0].partition_id,
            "split_point": 7,
            "split_partition_id_low": "a" * 20,
            "split_partition_id_high": "b" * 20,
            "split_servers_low": ["node1"],
            "split_servers_high": ["node1"],
            "finalize_immediately": True,
        },
        input_txnid=f.txnid,
    )
    out = make_coordinator(cdir).perform_and_commit_operation(
        "default", "ev3", op
    )
    assert out.seq == 2
    assert (
        cdir.get_table_config("default", "ev3")["metadata_txnid"]
        == op.output_txnid
    )
    p.close()


def test_metadata_replication_catches_up_lagging_server(meta_cluster):
    """A metadata server that missed a CAS transaction fetches the head
    file from a peer (reference: db/metadata_replication.cc)."""
    cfg, cdir, servers = meta_cluster
    p, _rt = _create_table(cfg)
    tcfg = cdir.get_table_config("default", "ev")

    from eventql_tpu.db.metadata_replication import MetadataReplication

    # simulate node2 having missed the creation: drop its copy
    servers[1].metadata_service.drop_file(
        "default", "ev", tcfg["metadata_txnid"]
    )
    assert not servers[1].metadata_service.store.has_file(
        "default", "ev", tcfg["metadata_txnid"]
    )

    mr = MetadataReplication(servers[1].metadata_service, cfg, "node2")
    actions = mr.replicate_once()
    assert any("fetched metadata txn" in a for a in actions), actions
    f = servers[1].metadata_service.get_file(
        "default", "ev", tcfg["metadata_txnid"]
    )
    assert f.seq == tcfg["metadata_txnseq"]

    # a server not in the metadata-server set does nothing
    mr3 = MetadataReplication(servers[2].metadata_service, cfg, "node3")
    assert mr3.replicate_once() == []
    p.close()


def test_autosplit_and_full_split_lifecycle(meta_cluster):
    """needsSplit → METAOP_SPLIT_PARTITION (splitting state) → split
    targets LOAD the child keyranges → a serving replica finalizes via
    METAOP_FINALIZE_SPLIT → the displaced replica UNLOADs its rows
    (reference: partition_writer.cc:538-589 + partitioning.txt §4.3)."""
    cfg, cdir, servers = meta_cluster
    p, rt = _create_table(cfg)
    for i in range(30):
        p.insert_json("ev", json.dumps({"t": i, "v": 1}))

    from eventql_tpu.db import autosplit
    from eventql_tpu.db.replication import ReplicationWorker

    changes = autosplit.run_once(
        servers[0].table_service,
        cdir,
        threshold_rows=10,
        remote_factory=remote_factory_from_cdir(cdir),
    )
    assert changes, "expected at least one split"
    tcfg = cdir.get_table_config("default", "ev")
    assert tcfg["metadata_txnseq"] == 2

    proxy = MetadataServiceProxy("127.0.0.1", servers[0].port)
    head = proxy.get_file("default", "ev", tcfg["metadata_txnid"])
    assert head.seq == 2
    # the least-loaded server (node3, no placements) is a split target,
    # so the partition is splitting, not finalized
    assert head.entries[0].splitting
    low_sids = {pl.server_id for pl in head.entries[0].split_servers_low}
    assert "node3" in low_sids
    # routing still shows the parent until the split finalizes
    assert len(tcfg["metadata"]["partitions"]) == 1

    workers = [
        ReplicationWorker(s.table_service, cfg, f"node{i + 1}")
        for i, s in enumerate(servers)
    ]

    # LOAD: node3 pulls both child keyranges from the serving replicas
    actions3 = workers[2].lifecycle_once()
    assert any("loaded" in a for a in actions3), actions3
    assert servers[2].table_service.get_table_data("ev").num_rows == 30

    # FINALIZE: a serving replica sees every target caught up
    actions1 = workers[0].lifecycle_once()
    assert any("split finalized" in a for a in actions1), actions1
    tcfg2 = cdir.get_table_config("default", "ev")
    assert tcfg2["metadata_txnseq"] == 3
    assert len(tcfg2["metadata"]["partitions"]) == 2
    head2 = proxy.get_file("default", "ev", tcfg2["metadata_txnid"])
    assert not any(e.splitting for e in head2.entries)
    proxy.close()

    # queries still count every row exactly once through the new map
    p2 = cluster_provider_from_config(cfg)
    txn = rt.new_transaction(p2)
    assert rt.build_query_plan(
        txn, "select count(1) from ev;"
    ).execute(0).rows == [["30"]]
    p2.close()

    # UNLOAD: any displaced replica drops its local rows
    placed = set()
    for e in head2.entries:
        placed |= {pl.server_id for pl in e.servers}
    for i, s in enumerate(servers):
        sid = f"node{i + 1}"
        if sid in placed:
            continue
        acts = workers[i].lifecycle_once()
        assert any("unloaded" in a for a in acts), (sid, acts)
        assert s.table_service.get_table_data("ev").num_rows == 0
    p.close()
