"""ZooKeeper protocol + config-directory backend tests.

The reference's cluster backend is ZooKeeper
(config/config_directory_zookeeper.cc); ours speaks the real jute wire
protocol against an embedded server (eventql_tpu/config/zookeeper.py),
so these tests exercise actual client/server TCP round trips."""

import json
import threading
import time

import pytest

from eventql_tpu.config.zookeeper import (
    EPHEMERAL,
    SEQUENCE,
    ZBADVERSION,
    ZNODEEXISTS,
    ZNONODE,
    ZNOTEMPTY,
    EVENT_CHANGED,
    EVENT_CHILD,
    EVENT_CREATED,
    EVENT_DELETED,
    ZKError,
    ZooKeeperClient,
    ZooKeeperServer,
)


@pytest.fixture
def zk_server():
    srv = ZooKeeperServer().start()
    yield srv
    srv.stop()


@pytest.fixture
def zk(zk_server):
    client = ZooKeeperClient(zk_server.address)
    yield client
    client.close()


def test_session_handshake(zk):
    assert zk.session_id != 0
    assert zk.negotiated_timeout >= 4000


def test_create_get_set_delete(zk):
    path = zk.create("/a", b"hello")
    assert path == "/a"
    data, stat = zk.get("/a")
    assert data == b"hello"
    assert stat.version == 0
    stat2 = zk.set("/a", b"world")
    assert stat2.version == 1
    data, _ = zk.get("/a")
    assert data == b"world"
    zk.delete("/a")
    assert zk.exists("/a") is None


def test_create_errors(zk):
    zk.create("/x", b"")
    with pytest.raises(ZKError) as e:
        zk.create("/x", b"")
    assert e.value.code == ZNODEEXISTS
    with pytest.raises(ZKError) as e:
        zk.create("/no/such/parent", b"")
    assert e.value.code == ZNONODE
    with pytest.raises(ZKError) as e:
        zk.get("/missing")
    assert e.value.code == ZNONODE


def test_version_cas(zk):
    zk.create("/v", b"1")
    _, stat = zk.get("/v")
    zk.set("/v", b"2", stat.version)
    with pytest.raises(ZKError) as e:
        zk.set("/v", b"3", stat.version)  # stale version
    assert e.value.code == ZBADVERSION
    data, _ = zk.get("/v")
    assert data == b"2"


def test_children_and_notempty(zk):
    zk.ensure_path("/parent")
    zk.create("/parent/c1", b"")
    zk.create("/parent/c2", b"")
    assert zk.get_children("/parent") == ["c1", "c2"]
    with pytest.raises(ZKError) as e:
        zk.delete("/parent")
    assert e.value.code == ZNOTEMPTY


def test_sequence_nodes(zk):
    zk.ensure_path("/seq")
    p1 = zk.create("/seq/n-", b"", flags=SEQUENCE)
    p2 = zk.create("/seq/n-", b"", flags=SEQUENCE)
    assert p1 == "/seq/n-0000000000"
    assert p2 == "/seq/n-0000000001"


def test_ephemeral_dies_with_session(zk_server):
    c1 = ZooKeeperClient(zk_server.address)
    c2 = ZooKeeperClient(zk_server.address)
    c1.create("/eph", b"mine", flags=EPHEMERAL)
    assert c2.exists("/eph") is not None
    with pytest.raises(ZKError) as e:
        c2.create("/eph", b"", flags=EPHEMERAL)
    assert e.value.code == ZNODEEXISTS
    c1.close()
    deadline = time.time() + 5
    while time.time() < deadline and c2.exists("/eph") is not None:
        time.sleep(0.05)
    assert c2.exists("/eph") is None
    # now the other session can take it
    c2.create("/eph", b"", flags=EPHEMERAL)
    c2.close()


def test_watches(zk_server):
    events = []
    done = threading.Event()

    def watcher(etype, state, path):
        events.append((etype, path))
        done.set()

    watcher_client = ZooKeeperClient(zk_server.address, watcher=watcher)
    writer = ZooKeeperClient(zk_server.address)
    writer.create("/w", b"0")

    # data watch fires once on change
    watcher_client.get("/w", watch=True)
    writer.set("/w", b"1")
    assert done.wait(5)
    assert events == [(EVENT_CHANGED, "/w")]
    # one-shot: a second change doesn't fire without re-arming
    done.clear()
    writer.set("/w", b"2")
    assert not done.wait(0.3)

    # child watch
    events.clear()
    watcher_client.get_children("/", watch=True)
    writer.create("/w2", b"")
    assert done.wait(5)
    assert (EVENT_CHILD, "/") in events

    # exists watch fires on creation
    events.clear()
    done.clear()
    assert watcher_client.exists("/future", watch=True) is None
    writer.create("/future", b"")
    assert done.wait(5)
    assert (EVENT_CREATED, "/future") in events

    # deletion fires data watch
    events.clear()
    done.clear()
    watcher_client.get("/w", watch=True)
    writer.delete("/w")
    assert done.wait(5)
    assert (EVENT_DELETED, "/w") in events

    watcher_client.close()
    writer.close()


def test_concurrent_clients(zk_server):
    """Parallel increments through version CAS all land."""
    c0 = ZooKeeperClient(zk_server.address)
    c0.create("/ctr", b"0")

    def worker():
        c = ZooKeeperClient(zk_server.address)
        for _ in range(20):
            while True:
                data, stat = c.get("/ctr")
                try:
                    c.set("/ctr", str(int(data) + 1).encode(), stat.version)
                    break
                except ZKError as e:
                    if e.code != ZBADVERSION:
                        raise
        c.close()

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    data, _ = c0.get("/ctr")
    assert int(data) == 80
    c0.close()


# -- the config directory over ZooKeeper -------------------------------------

@pytest.fixture
def zk_cdir(zk_server):
    from eventql_tpu.config.config_directory import ConfigDirectory
    from eventql_tpu.config import config_directory_zookeeper as zcd

    cdir = ConfigDirectory(f"zk://{zk_server.address}/testcluster")
    yield cdir
    zcd.reset_sessions()


def test_dispatch_on_scheme(zk_cdir):
    from eventql_tpu.config.config_directory_zookeeper import (
        ZookeeperConfigDirectory,
    )

    assert isinstance(zk_cdir, ZookeeperConfigDirectory)
    assert zk_cdir.cluster == "testcluster"


def test_zk_cluster_lifecycle(zk_cdir):
    from eventql_tpu.core.errors import RuntimeError_

    assert zk_cdir.get_cluster_config() is None
    zk_cdir.cluster_create("testcluster", replication_factor=3)
    cfg = zk_cdir.get_cluster_config()
    assert cfg["replication_factor"] == 3
    with pytest.raises(RuntimeError_, match="already exists"):
        zk_cdir.cluster_create("testcluster")


def test_zk_servers_and_liveness(zk_cdir, zk_server):
    from eventql_tpu.config.config_directory import (
        SERVER_DOWN,
        SERVER_UP,
        ServerConfig,
    )

    zk_cdir.cluster_create("testcluster")
    zk_cdir.update_server_config(ServerConfig(
        server_id="s1", server_addr="127.0.0.1:9175",
        server_status=SERVER_UP))
    zk_cdir.update_server_config(ServerConfig(
        server_id="s2", server_addr="127.0.0.1:9176",
        server_status=SERVER_DOWN))
    servers = {s.server_id: s for s in zk_cdir.list_servers()}
    assert servers["s1"].server_status == SERVER_UP
    assert servers["s2"].server_status == SERVER_DOWN
    assert zk_cdir.worker_addrs() == [("127.0.0.1", 9175)]

    # liveness is an ephemeral: a different process/session observing
    # the registry sees UP only while our session lives
    zk_cdir.update_server_config(ServerConfig(
        server_id="s1", server_addr="127.0.0.1:9175",
        server_status=SERVER_DOWN))
    servers = {s.server_id: s for s in zk_cdir.list_servers()}
    assert servers["s1"].server_status == SERVER_DOWN

    zk_cdir.remove_server("s2")
    assert [s.server_id for s in zk_cdir.list_servers()] == ["s1"]


def test_zk_namespaces_and_tables(zk_cdir):
    from eventql_tpu.core.errors import RuntimeError_

    zk_cdir.cluster_create("testcluster")
    zk_cdir.create_namespace("db1")
    with pytest.raises(RuntimeError_, match="already exists"):
        zk_cdir.create_namespace("db1")
    assert zk_cdir.list_namespaces() == ["db1"]

    zk_cdir.update_table_config("db1", "t1", {"schema": {"cols": []}})
    zk_cdir.update_table_config("db1", "t1", {"partition_size": 42})
    cfg = zk_cdir.get_table_config("db1", "t1")
    assert cfg["schema"] == {"cols": []}
    assert cfg["partition_size"] == 42
    assert zk_cdir.get_table_config("db1", "missing") is None


def test_zk_metadata_cas(zk_cdir):
    zk_cdir.cluster_create("testcluster")
    zk_cdir.update_table_config("db1", "t1", {"metadata_txnid": "aaa"})
    assert zk_cdir.commit_metadata_txn("db1", "t1", "aaa", "bbb", 2)
    assert not zk_cdir.commit_metadata_txn("db1", "t1", "aaa", "ccc", 3)
    assert zk_cdir.commit_metadata_txn("db1", "t1", "bbb", "ccc", 3)
    cfg = zk_cdir.get_table_config("db1", "t1")
    assert cfg["metadata_txnid"] == "ccc"
    assert cfg["metadata_txnseq"] == 3


def test_zk_read_doc_shape(zk_cdir):
    """_read() assembles the standalone registry's document shape for
    the read-only consumers (rebalance, allocator, autosplit)."""
    from eventql_tpu.config.config_directory import SERVER_UP, ServerConfig

    zk_cdir.cluster_create("testcluster")
    zk_cdir.update_server_config(ServerConfig(
        server_id="s1", server_addr="127.0.0.1:9175",
        server_status=SERVER_UP))
    zk_cdir.update_table_config("db1", "t1", {"x": 1})
    doc = zk_cdir._read()
    assert doc["cluster"]["name"] == "testcluster"
    assert doc["servers"]["s1"]["server_status"] == SERVER_UP
    assert doc["namespaces"]["db1"]["tables"]["t1"] == {"x": 1}


def test_zk_leader_election(zk_server):
    from eventql_tpu.config.config_directory import ConfigDirectory
    from eventql_tpu.config import config_directory_zookeeper as zcd
    from eventql_tpu.config.zookeeper import ZooKeeperClient
    from eventql_tpu.db.leader import Leader

    url = f"zk://{zk_server.address}/lead"
    ConfigDirectory(url).cluster_create("lead")

    l1 = Leader(url, "server-a", rebalance_interval=999)
    assert l1.try_acquire()
    assert l1.is_leader
    # a second contender from another session loses
    other = ZooKeeperClient(zk_server.address)
    from eventql_tpu.config.zookeeper import EPHEMERAL, ZKError

    with pytest.raises(ZKError):
        other.create("/eventql/lead/leader", b"server-b", flags=EPHEMERAL)
    # idempotent re-acquire
    assert l1.try_acquire()
    l1.release()
    assert not l1.is_leader
    # now the other session can win
    other.create("/eventql/lead/leader", b"server-b", flags=EPHEMERAL)
    assert ConfigDirectory(url).current_leader() == "server-b"
    other.close()
    zcd.reset_sessions()


def test_distributed_query_over_zookeeper_registry(zk_server):
    """Full cluster flow with ZooKeeper as the coordination service:
    workers register (ephemeral liveness), the coordinator discovers
    them from ZooKeeper and fans a distributed GROUP BY out over the
    native protocol (reference: zookeeper-backed ConfigDirectory
    feeding the scheduler's replica lists, server/sql/scheduler.cc)."""
    from eventql_tpu.config.config_directory import (
        SERVER_UP,
        ConfigDirectory,
        ServerConfig,
    )
    from eventql_tpu.config import config_directory_zookeeper as zcd
    from eventql_tpu.db.table_service import TableService
    from eventql_tpu.exec.runtime import Runtime
    from eventql_tpu.parallel.cluster import cluster_provider_from_config
    from eventql_tpu.server.native_tcp import (
        NativeTCPClient,
        NativeTCPServer,
    )

    url = f"zk://{zk_server.address}/qcluster"
    cdir = ConfigDirectory(url)
    cdir.cluster_create("qcluster", replication_factor=1)

    schema = (
        "CREATE TABLE ev (t uint64, dim string, v uint64,"
        " PRIMARY KEY (t));"
    )
    servers = []
    rowsets = [
        ['{"t": 1, "dim": "a", "v": 10}', '{"t": 2, "dim": "b", "v": 20}'],
        ['{"t": 3, "dim": "a", "v": 30}', '{"t": 4, "dim": "c", "v": 5}'],
    ]
    for i, rows in enumerate(rowsets):
        server = NativeTCPServer(TableService(), port=0).start()
        c = NativeTCPClient("127.0.0.1", server.port)
        c.query(schema)
        c.insert_json("ev", rows)
        c.close()
        cdir.update_server_config(ServerConfig(
            server_id=f"node{i}",
            server_addr=f"127.0.0.1:{server.port}",
            server_status=SERVER_UP,
        ))
        servers.append(server)

    try:
        provider = cluster_provider_from_config(url)
        rt = Runtime()
        txn = rt.new_transaction(provider)
        rows = rt.build_query_plan(
            txn,
            "select dim, sum(v) from ev group by dim order by dim;",
        ).execute(0).rows
        assert rows == [["a", "40"], ["b", "20"], ["c", "5"]]
        provider.close()
    finally:
        for s in servers:
            s.stop()
        zcd.reset_sessions()


def test_zkserver_cli(zk_server):
    """The zkserver CLI module boots a usable server."""
    import subprocess
    import sys
    import time as _t

    proc = subprocess.Popen(
        [sys.executable, "-m", "eventql_tpu.cli.zkserver",
         "--listen", "127.0.0.1:0"],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        line = proc.stdout.readline()
        assert "listening on" in line
        addr = line.strip().rsplit(" ", 1)[-1]
        c = ZooKeeperClient(addr)
        c.create("/cli-test", b"ok")
        data, _ = c.get("/cli-test")
        assert data == b"ok"
        c.close()
    finally:
        proc.terminate()
        proc.wait(timeout=10)
