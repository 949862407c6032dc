"""Connection pool tests (reference: TCPConnectionPool semantics in
transport/native/client_tcp.cc:867-990)."""

import time

import pytest

from eventql_tpu.db.table_service import TableService
from eventql_tpu.parallel.conn_pool import TCPConnectionPool
from eventql_tpu.server.native_tcp import NativeTCPClient, NativeTCPServer


class FakeConn:
    def __init__(self):
        self.closed = False

    def close(self):
        self.closed = True


def test_checkout_checkin_roundtrip():
    pool = TCPConnectionPool()
    addr = ("h", 1)
    assert pool.checkout(addr) is None
    c = FakeConn()
    pool.checkin(addr, c)
    assert pool.checkout(addr) is c
    assert pool.checkout(addr) is None  # taken


def test_linger_eviction():
    """Connections older than the linger timeout are never handed out
    (reference: getFD's cutoff scan, client_tcp.cc:920-945)."""
    pool = TCPConnectionPool(linger_timeout=0.05)
    addr = ("h", 1)
    c = FakeConn()
    pool.checkin(addr, c)
    time.sleep(0.08)
    assert pool.checkout(addr) is None
    assert c.closed


def test_per_host_cap_evicts_oldest():
    pool = TCPConnectionPool(max_conns_per_host=2)
    addr = ("h", 1)
    c1, c2, c3 = FakeConn(), FakeConn(), FakeConn()
    pool.checkin(addr, c1)
    pool.checkin(addr, c2)
    pool.checkin(addr, c3)  # evicts c1 (oldest)
    assert c1.closed and not c2.closed and not c3.closed
    # newest first on checkout
    assert pool.checkout(addr) is c3
    assert pool.checkout(addr) is c2


def test_global_cap_drops_surplus():
    pool = TCPConnectionPool(max_conns=1)
    c1, c2 = FakeConn(), FakeConn()
    pool.checkin(("a", 1), c1)
    pool.checkin(("b", 2), c2)  # over the global cap → dropped
    assert c2.closed and not c1.closed


def test_pooled_call_reuses_socket():
    """Two sequential requests ride one TCP connection."""
    server = NativeTCPServer(TableService(), port=0).start()
    try:
        pool = TCPConnectionPool()
        addr = ("127.0.0.1", server.port)
        r1 = pool.call(addr, lambda c: c.query("select 1 as a;"))
        assert pool.stats_misses == 1
        r2 = pool.call(addr, lambda c: c.query("select 2 as b;"))
        assert r1[0][1] == [["1"]] and r2[0][1] == [["2"]]
        assert pool.stats_hits == 1  # second call reused the socket
        pool.close()
    finally:
        server.stop()


def test_pooled_call_retries_dead_socket():
    """A pooled socket the peer closed retries once on a fresh
    connection instead of failing the request."""
    server = NativeTCPServer(TableService(), port=0).start()
    try:
        pool = TCPConnectionPool()
        addr = ("127.0.0.1", server.port)
        pool.call(addr, lambda c: c.query("select 1 as a;"))
        # kill the pooled socket under the pool's feet
        lst = pool._conns[addr]
        lst[0][1].sock.close()
        out = pool.call(addr, lambda c: c.query("select 3 as c;"))
        assert out[0][1] == [["3"]]
        pool.close()
    finally:
        server.stop()


def test_pooled_call_keeps_connection_after_sql_error():
    """An ERROR response leaves the connection healthy — it must return
    to the pool, not be closed."""
    from eventql_tpu.core.errors import SQLError

    server = NativeTCPServer(TableService(), port=0).start()
    try:
        pool = TCPConnectionPool()
        addr = ("127.0.0.1", server.port)
        with pytest.raises(SQLError):
            pool.call(addr, lambda c: c.query("select ;"))
        out = pool.call(addr, lambda c: c.query("select 4 as d;"))
        assert out[0][1] == [["4"]]
        assert pool.stats_hits == 1
        pool.close()
    finally:
        server.stop()


def test_cluster_provider_shares_pool_across_instances():
    """Per-request provider instances reuse the process-wide pool — the
    repeated-query path pays zero reconnects (VERDICT: reference keys
    pooled connections in client_tcp.h:233-270)."""
    from eventql_tpu.parallel import conn_pool
    from eventql_tpu.parallel.cluster import ClusterTableProvider

    server = NativeTCPServer(TableService(), port=0).start()
    try:
        # isolate the global pool for the assertion
        old = conn_pool._GLOBAL_POOL
        conn_pool._GLOBAL_POOL = TCPConnectionPool()
        try:
            addr = ("127.0.0.1", server.port)
            p1 = ClusterTableProvider([addr])
            p1.create_table_sql = None  # no-op guard
            p1._query(addr, "select 1 as x;")
            p2 = ClusterTableProvider([addr])
            p2._query(addr, "select 2 as y;")
            pool = conn_pool.global_pool()
            assert pool.stats_misses == 1
            assert pool.stats_hits == 1
        finally:
            conn_pool._GLOBAL_POOL.close()
            conn_pool._GLOBAL_POOL = old
    finally:
        server.stop()
