"""Native binary protocol tests (reference wire format:
doc/internals/binary_protocol.txt + transport/native/frames)."""

import pytest

from eventql_tpu.core.errors import SQLError
from eventql_tpu.db.table_service import TableService
from eventql_tpu.server.native_tcp import NativeTCPClient, NativeTCPServer


@pytest.fixture
def server():
    s = NativeTCPServer(TableService(), port=0).start()
    yield s
    s.stop()


def test_handshake_and_ping(server):
    c = NativeTCPClient("127.0.0.1", server.port)
    assert c.ping()
    c.close()


def test_query_roundtrip(server):
    c = NativeTCPClient("127.0.0.1", server.port)
    results = c.query("select 1 + 1 as two;")
    assert results == [(["two"], [["2"]])]
    c.close()


def test_multi_statement_query(server):
    c = NativeTCPClient("127.0.0.1", server.port)
    results = c.query("select 1 as a; select 2 as b;")
    assert results == [(["a"], [["1"]]), (["b"], [["2"]])]
    c.close()


def test_query_error(server):
    c = NativeTCPClient("127.0.0.1", server.port)
    with pytest.raises(SQLError) as e:
        c.query("select ;")
    assert "unexpected token T_SEMICOLON" in str(e.value)
    c.close()


def test_insert_and_query(server):
    c = NativeTCPClient("127.0.0.1", server.port)
    c.query(
        "CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));"
    )
    c.insert_json("ev", ['{"t": 1, "v": 10}', '{"t": 2, "v": 32}'])
    results = c.query("select sum(v) from ev;")
    assert results[0][1] == [["42"]]
    c.close()


def test_heartbeats_during_slow_query():
    """The server emits HEARTBEAT frames while a query executes so long
    queries survive client idle timeouts (reference: session heartbeat
    in transport/native/connection_tcp.cc)."""
    import time

    from eventql_tpu.server import native_tcp as nt

    class SlowService(TableService):
        def get_table_data(self, table_name):
            time.sleep(0.35)
            return super().get_table_data(table_name)

    svc = SlowService()
    server = NativeTCPServer(svc, port=0)
    server.HEARTBEAT_INTERVAL = 0.1
    server.start()
    try:
        c = NativeTCPClient("127.0.0.1", server.port)
        c.query("CREATE TABLE ev (t uint64, PRIMARY KEY (t));")
        c.insert_json("ev", ['{"t": 1}'])
        # issue the query manually and count heartbeat frames
        payload = (
            nt.write_lenencstr(b"select count(1) from ev;")
            + nt.write_varint(0)
            + nt.write_varint(0)
        )
        nt._send_frame(c.sock, nt.OP_QUERY, 0, payload)
        heartbeats = 0
        while True:
            opcode, flags, body = nt._recv_frame(c.sock)
            if opcode == nt.OP_HEARTBEAT:
                heartbeats += 1
                continue
            assert opcode == nt.OP_QUERY_RESULT
            break
        assert heartbeats >= 2
        c.close()
    finally:
        server.stop()


def test_query_progress_frames():
    """EVQL_QUERY_PROGRESS (0x4) makes the server stream QUERY_PROGRESS
    frames during execution (reference: ops/query.cc:91-126, frame
    layout frames/query_progress.cc:63-70)."""
    svc = TableService()
    server = NativeTCPServer(svc, port=0)
    server.HEARTBEAT_INTERVAL = 0.02  # tighten the cadence for the test
    server.start()
    try:
        c = NativeTCPClient("127.0.0.1", server.port)
        seen = []

        class SlowPlan:
            num_queries = 1

            def execute(self, i):
                import time as _t

                _t.sleep(0.2)
                real = c2_runtime.build_query_plan(
                    c2_txn, "select 42 as v;"
                )
                return real.execute(0)

        from eventql_tpu.exec.runtime import Runtime

        rt = Runtime()
        c2_runtime = rt
        c2_txn = rt.new_transaction(svc)
        orig = server.runtime.build_query_plan
        server.runtime.build_query_plan = lambda txn, q: SlowPlan()
        try:
            results = c.query("select 42 as v;", on_progress=seen.append)
        finally:
            server.runtime.build_query_plan = orig
        assert results[0] == (["v"], [["42"]])
        assert len(seen) >= 1
        assert all(0 <= p["progress_permill"] <= 1000 for p in seen)
        assert seen[-1]["elapsed_ms"] >= 0
        c.close()
    finally:
        server.stop()
