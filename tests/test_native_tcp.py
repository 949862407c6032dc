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

            execute_stream = execute

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


def _frame_paging_setup(server, nrows=23):
    """Create a table with nrows rows and return a connected client."""
    c = NativeTCPClient("127.0.0.1", server.port)
    c.query("CREATE TABLE pg (t uint64, v uint64, PRIMARY KEY (t));")
    c.insert_json(
        "pg", ['{"t": %d, "v": %d}' % (i, i * 2) for i in range(nrows)]
    )
    return c


def test_query_result_pagination_frames():
    """QUERY_CONTINUE flow control: with maxrows=5 the server sends
    6-row pages (the reference flushes when rowcount EXCEEDS maxrows,
    ops/query.cc:150-158), blocks on QUERY_CONTINUE between pages, and
    only the final frame carries QR_COMPLETE + ENDOFREQUEST."""
    from eventql_tpu.server import native_tcp as nt

    server = NativeTCPServer(TableService(), port=0).start()
    try:
        c = _frame_paging_setup(server, nrows=23)
        payload = (
            nt.write_lenencstr(b"select t, v from pg order by t;")
            + nt.write_varint(0)
            + nt.write_varint(5)  # maxrows
        )
        nt._send_frame(c.sock, nt.OP_QUERY, 0, payload)
        pages = []
        while True:
            opcode, flags, body = nt._recv_frame(c.sock)
            if opcode == nt.OP_HEARTBEAT:
                continue
            assert opcode == nt.OP_QUERY_RESULT
            qf, pos = nt.read_varint(body, 0)
            ncols, pos = nt.read_varint(body, pos)
            nrows, pos = nt.read_varint(body, pos)
            pages.append((qf, flags, ncols, nrows))
            if qf & nt.QR_COMPLETE:
                break
            nt._send_frame(c.sock, nt.OP_QUERY_CONTINUE, 0, b"")
        # 23 rows at maxrows=5 → pages of 6,6,6,5 (reference quirk:
        # a page flushes at maxrows+1 rows)
        assert [p[3] for p in pages] == [6, 6, 6, 5]
        # every frame re-sends colnames+stats; only the last is
        # COMPLETE and carries ENDOFREQUEST
        for qf, flags, ncols, _n in pages:
            assert qf & nt.QR_HASCOLNAMES and qf & nt.QR_HASSTATS
            assert ncols == 2
        assert all((p[0] & nt.QR_COMPLETE) == 0 for p in pages[:-1])
        assert all((p[1] & nt.F_ENDOFREQUEST) == 0 for p in pages[:-1])
        assert pages[-1][0] & nt.QR_COMPLETE
        assert pages[-1][1] & nt.F_ENDOFREQUEST
        # connection stays usable
        assert c.query("select 7 as x;")[0][1] == [["7"]]
        c.close()
    finally:
        server.stop()


def test_query_result_discard_mid_result():
    """QUERY_DISCARD after a partial page abandons the statement's
    remaining rows; the server still ends with a COMPLETE frame and the
    connection stays usable (reference: ops/query.cc:160-193)."""
    from eventql_tpu.server import native_tcp as nt

    server = NativeTCPServer(TableService(), port=0).start()
    try:
        c = _frame_paging_setup(server, nrows=23)
        payload = (
            nt.write_lenencstr(b"select t from pg order by t;")
            + nt.write_varint(0)
            + nt.write_varint(5)
        )
        nt._send_frame(c.sock, nt.OP_QUERY, 0, payload)
        opcode, flags, body = nt._recv_frame(c.sock)
        while opcode == nt.OP_HEARTBEAT:
            opcode, flags, body = nt._recv_frame(c.sock)
        assert opcode == nt.OP_QUERY_RESULT
        qf, pos = nt.read_varint(body, 0)
        assert not qf & nt.QR_COMPLETE
        nt._send_frame(c.sock, nt.OP_QUERY_DISCARD, 0, b"")
        opcode, flags, body = nt._recv_frame(c.sock)
        while opcode == nt.OP_HEARTBEAT:
            opcode, flags, body = nt._recv_frame(c.sock)
        assert opcode == nt.OP_QUERY_RESULT
        qf, pos = nt.read_varint(body, 0)
        ncols, pos = nt.read_varint(body, pos)
        nrows, pos = nt.read_varint(body, pos)
        assert qf & nt.QR_COMPLETE
        assert nrows == 0
        # connection stays usable after the discard
        assert c.query("select 9 as x;")[0][1] == [["9"]]
        c.close()
    finally:
        server.stop()


def test_query_client_batch_size_roundtrip():
    """The python client pages transparently: a batch_size smaller than
    the result still yields every row, in order."""
    server = NativeTCPServer(TableService(), port=0).start()
    try:
        c = _frame_paging_setup(server, nrows=57)
        results = c.query(
            "select t, v from pg order by t;", batch_size=7
        )
        assert len(results) == 1
        cols, rows = results[0]
        assert cols == ["t", "v"]
        assert rows == [[str(i), str(i * 2)] for i in range(57)]
        # multi-statement + paging compose
        results = c.query(
            "select count(1) as n from pg; select t from pg order by t;",
            batch_size=3,
        )
        assert results[0][1] == [["57"]]
        assert [r[0] for r in results[1][1]] == [str(i) for i in range(57)]
        c.close()
    finally:
        server.stop()


def test_recv_frame_rejects_oversized():
    """Frames over 256 MB are a protocol violation (reference:
    connection.h:34 kMaxFrameSize; connection_tcp.cc:151)."""
    import socket
    import struct

    from eventql_tpu.server import native_tcp as nt

    server = NativeTCPServer(TableService(), port=0).start()
    try:
        s = socket.create_connection(("127.0.0.1", server.port))
        # claim a 300 MB HELLO frame; the server must drop the
        # connection rather than buffer it
        s.sendall(struct.pack(">HHI", nt.OP_HELLO, 0, 300 * 1024 * 1024))
        s.sendall(b"x" * 1024)
        s.settimeout(5.0)
        try:
            data = s.recv(4096)
        except (ConnectionError, socket.timeout, OSError):
            data = b""
        assert data == b""  # connection closed, no READY
        s.close()
    finally:
        server.stop()
