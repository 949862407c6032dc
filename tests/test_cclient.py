"""C client library system tests: the native/evql_client.c shared
library driven through ctypes against a live server (reference C API:
src/eventql/eventql.h:160-298; wire format binary_protocol.txt)."""

import pytest

from eventql_tpu.client.cclient import CClient, CClientError, available
from eventql_tpu.db.table_service import TableService
from eventql_tpu.server.native_tcp import NativeTCPServer

pytestmark = pytest.mark.skipif(
    not available(), reason="native toolchain unavailable"
)


@pytest.fixture
def server():
    s = NativeTCPServer(TableService(), port=0).start()
    yield s
    s.stop()


def test_c_client_query(server):
    c = CClient("127.0.0.1", server.port)
    results = c.query("select 1 + 1 as two, 'hi' as s;")
    assert results == [(["two", "s"], [["2", "hi"]])]
    c.close()


def test_c_client_multi_statement(server):
    c = CClient("127.0.0.1", server.port)
    results = c.query("select 1 as a; select 2 as b;")
    assert results == [(["a"], [["1"]]), (["b"], [["2"]])]
    c.close()


def test_c_client_table_roundtrip(server):
    c = CClient("127.0.0.1", server.port)
    c.query("CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));")
    c.query("INSERT INTO ev (t, v) VALUES (1, 10);")
    c.query("INSERT INTO ev (t, v) VALUES (2, 32);")
    results = c.query("select sum(v) from ev;")
    assert results[0][1] == [["42"]]
    c.close()


def test_c_client_error(server):
    c = CClient("127.0.0.1", server.port)
    with pytest.raises(CClientError, match="unexpected token"):
        c.query("select ;")
    # connection still usable after an error
    assert c.query("select 1 as x;")[0][1] == [["1"]]
    c.close()


def test_c_client_auth():
    from eventql_tpu.server.auth import LegacyClientAuth

    auth = LegacyClientAuth("cs")
    server = NativeTCPServer(TableService(), port=0, client_auth=auth).start()
    try:
        with pytest.raises(CClientError, match="missing auth token"):
            CClient("127.0.0.1", server.port)
        c = CClient(
            "127.0.0.1", server.port, auth_token=auth.make_token("db", "u")
        )
        assert c.query("select 5 as x;")[0][1] == [["5"]]
        c.close()
    finally:
        server.stop()
