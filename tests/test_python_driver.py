"""Python HTTP driver tests (reference inventory: drivers/python — a
thin stdlib-only client over /api/v1)."""

import sys
import os

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "drivers", "python")
)
import eventql as evql_driver  # noqa: E402

from eventql_tpu.server.http_api import EventQLServer  # noqa: E402


@pytest.fixture
def server():
    s = EventQLServer(port=0).start()
    yield s
    s.stop()


def test_driver_query(server):
    conn = evql_driver.connect(host="127.0.0.1", port=server.port)
    rs = conn.query("select 6 * 7 as x;")
    assert rs.columns == ["x"]
    assert list(rs) == [{"x": "42"}]


def test_driver_insert_and_query(server):
    conn = evql_driver.connect(host="127.0.0.1", port=server.port)
    conn.query("CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));")
    conn.insert("ev", [{"t": 1, "v": 40}, {"t": 2, "v": 2}])
    rs = conn.query("select sum(v) from ev;")
    assert rs.rows == [["42"]]


def test_driver_error(server):
    conn = evql_driver.connect(host="127.0.0.1", port=server.port)
    with pytest.raises(evql_driver.Error, match="unexpected token"):
        conn.query("select ;")


def test_driver_auth(tmp_path):
    from eventql_tpu.server.auth import LegacyClientAuth

    auth = LegacyClientAuth("drv")
    server = EventQLServer(port=0, client_auth=auth).start()
    try:
        with pytest.raises(evql_driver.Error, match="missing auth token"):
            evql_driver.connect(host="127.0.0.1", port=server.port).query(
                "select 1;"
            )
        conn = evql_driver.connect(
            host="127.0.0.1",
            port=server.port,
            auth_token=auth.make_token("db", "u"),
        )
        assert conn.query("select 1 as one;").rows == [["1"]]
    finally:
        server.stop()
