"""MySQL wire client + mysql2evql live mode, driven against an
in-process mock server speaking the server side of the protocol
(protocol-41 handshake, mysql_native_password verification, COM_QUERY
text resultsets). The client is the deliverable (reference:
tools/mysql2evql.cc streams from live MySQL via libmysqlclient); the
mock proves the framing both ways."""

import hashlib
import socket
import socketserver
import struct
import threading

import pytest

from eventql_tpu.client.mysql_wire import (
    MySQLConnection,
    MySQLError,
    _lenenc_int,
    _native_password,
)

NONCE = b"abcdefgh12345678901j"  # 20 bytes
PASSWORD = "sekrit"


def _packet(seq, payload):
    return len(payload).to_bytes(3, "little") + bytes([seq]) + payload


def _lenenc_str(s: bytes) -> bytes:
    return _lenenc_int(len(s)) + s


def _coldef(name: bytes) -> bytes:
    return (
        _lenenc_str(b"def") + _lenenc_str(b"db") + _lenenc_str(b"t")
        + _lenenc_str(b"t") + _lenenc_str(name) + _lenenc_str(name)
        + b"\x0c" + struct.pack("<HIBHB", 33, 255, 0xFD, 0, 0) + b"\x00\x00"
    )


class MockMySQL(socketserver.ThreadingTCPServer):
    """Serves the handshake + canned resultsets for SHOW COLUMNS and
    SELECT * over table `users`."""

    allow_reuse_address = True
    daemon_threads = True


class Handler(socketserver.BaseRequestHandler):
    def _send(self, seq, payload):
        self.request.sendall(_packet(seq, payload))

    def _recv_packet(self):
        hdr = b""
        while len(hdr) < 4:
            c = self.request.recv(4 - len(hdr))
            if not c:
                return None, None
            hdr += c
        n = int.from_bytes(hdr[:3], "little")
        body = b""
        while len(body) < n:
            c = self.request.recv(n - len(body))
            if not c:
                return None, None
            body += c
        return hdr[3], body

    def handle(self):
        # HandshakeV10
        hs = (
            b"\x0a" + b"8.0.0-mock\x00"
            + struct.pack("<I", 7)           # thread id
            + NONCE[:8] + b"\x00"            # auth-data-1 + filler
            + struct.pack("<H", 0x0200 | 0x8000)  # caps low
            + bytes([33]) + struct.pack("<H", 2)  # charset + status
            + struct.pack("<H", (0x00080000 >> 16))  # caps high
            + bytes([21]) + b"\x00" * 10
            + NONCE[8:] + b"\x00"            # auth-data-2 (12+NUL)
            + b"mysql_native_password\x00"
        )
        self._send(0, hs)
        _seq, resp = self._recv_packet()
        if resp is None:
            return
        # verify the client's scramble
        flags = struct.unpack_from("<I", resp, 0)[0]
        assert flags & 0x0200
        pos = 4 + 4 + 1 + 23
        end = resp.index(b"\x00", pos)
        user = resp[pos:end]
        pos = end + 1
        alen = resp[pos]
        pos += 1
        auth = resp[pos : pos + alen]
        want = _native_password(PASSWORD, NONCE)
        if user != b"tester" or auth != want:
            self._send(2, b"\xff" + struct.pack("<H", 1045)
                       + b"#28000Access denied")
            return
        self._send(2, b"\x00\x00\x00\x02\x00\x00\x00")  # OK

        while True:
            seq, pkt = self._recv_packet()
            if pkt is None or pkt[:1] == b"\x01":  # COM_QUIT
                return
            assert pkt[0] == 0x03
            sql = pkt[1:].decode()
            if sql.startswith("SHOW COLUMNS"):
                cols = [b"Field", b"Type", b"Null", b"Key", b"Default",
                        b"Extra"]
                rows = [
                    [b"id", b"bigint(20)", b"NO", b"PRI", None, b""],
                    [b"name", b"varchar(64)", b"YES", b"", None, b""],
                    [b"score", b"double", b"YES", b"", None, b""],
                ]
            elif sql.startswith("SELECT * FROM `users`"):
                cols = [b"id", b"name", b"score"]
                rows = [
                    [b"1", b"ada", b"1.5"],
                    [b"2", b"bob", None],
                    [b"3", None, b"2.25"],
                ]
            elif sql.startswith("BOOM"):
                self._send(1, b"\xff" + struct.pack("<H", 1064)
                           + b"#42000syntax error near BOOM")
                continue
            else:
                self._send(1, b"\x00\x00\x00\x02\x00\x00\x00")  # OK
                continue
            s = 1
            self._send(s, _lenenc_int(len(cols))); s += 1
            for c in cols:
                self._send(s, _coldef(c)); s += 1
            self._send(s, b"\xfe\x00\x00\x02\x00"); s += 1  # EOF
            for r in rows:
                body = b"".join(
                    b"\xfb" if v is None else _lenenc_str(v) for v in r
                )
                self._send(s, body); s += 1
            self._send(s, b"\xfe\x00\x00\x02\x00")  # EOF


@pytest.fixture
def mock_server():
    srv = MockMySQL(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()
    srv.server_close()


def test_handshake_and_query(mock_server):
    host, port = mock_server
    c = MySQLConnection(host, port, user="tester", password=PASSWORD)
    assert c.server_version == "8.0.0-mock"
    names, rows = c.query("SELECT * FROM `users`")
    assert names == ["id", "name", "score"]
    got = list(rows)
    assert got == [
        [b"1", b"ada", b"1.5"],
        [b"2", b"bob", None],
        [b"3", None, b"2.25"],
    ]
    c.close()


def test_auth_rejected(mock_server):
    host, port = mock_server
    with pytest.raises(MySQLError, match="Access denied"):
        MySQLConnection(host, port, user="tester", password="wrong")


def test_error_packet(mock_server):
    host, port = mock_server
    c = MySQLConnection(host, port, user="tester", password=PASSWORD)
    with pytest.raises(MySQLError, match="syntax error"):
        c.query("BOOM")
    # connection still usable
    names, rows = c.query("SELECT * FROM `users`")
    assert len(list(rows)) == 3
    c.close()


def test_table_schema(mock_server):
    host, port = mock_server
    c = MySQLConnection(host, port, user="tester", password=PASSWORD)
    schema = c.table_schema("users")
    assert schema == [
        ("id", "bigint(20)", False, True),
        ("name", "varchar(64)", True, False),
        ("score", "double", True, False),
    ]
    c.close()


def test_mysql2evql_live_mode_end_to_end(mock_server):
    """Live import: mock MySQL → mysql2evql → a real evqld-style native
    server → queryable rows (the reference's full flow,
    mysql2evql.cc:50-245)."""
    from eventql_tpu.cli.mysql2evql import main as m2e_main
    from eventql_tpu.db.table_service import TableService
    from eventql_tpu.server.native_tcp import (
        NativeTCPClient,
        NativeTCPServer,
    )

    host, port = mock_server
    svc = TableService()
    server = NativeTCPServer(svc, port=0).start()
    try:
        rc = m2e_main([
            "--source_mysql",
            f"mysql://tester:{PASSWORD}@{host}:{port}/shop",
            "--source_table", "users",
            "--host", "127.0.0.1", "--port", str(server.port),
        ])
        assert rc == 0
        c = NativeTCPClient("127.0.0.1", server.port)
        res = c.query(
            "select id, name, score from users order by id;"
        )
        assert res[0][1] == [
            ["1", "ada", "1.500000"],
            ["2", "bob", "NULL"],
            ["3", "NULL", "2.250000"],
        ]
        c.close()
    finally:
        server.stop()


def test_read_packet_16mb_split():
    """Payloads >= 0xFFFFFF bytes arrive split across packets; a length
    of exactly 0xFFFFFF means a continuation follows (an empty trailing
    packet terminates an exact-multiple payload)."""
    from eventql_tpu.client.mysql_wire import MySQLConnection

    class FakeSock:
        def __init__(self, data):
            self.data = data
            self.pos = 0

        def recv(self, n):
            out = self.data[self.pos : self.pos + n]
            self.pos += len(out)
            return out

    conn = MySQLConnection.__new__(MySQLConnection)
    big = bytes(range(256)) * 65536  # 16 MB even

    def pkt(seq, payload):
        return len(payload).to_bytes(3, "little") + bytes([seq]) + payload

    # 16 MB payload: 0xFFFFFF chunk + 1-byte remainder
    wire = pkt(0, big[:0xFFFFFF]) + pkt(1, big[0xFFFFFF:])
    conn.sock = FakeSock(wire)
    assert conn._read_packet() == big

    # exact-0xFFFFFF payload: chunk + empty terminator
    exact = big[:0xFFFFFF]
    wire = pkt(0, exact) + pkt(1, b"")
    conn.sock = FakeSock(wire)
    assert conn._read_packet() == exact

    # small payload unchanged
    conn.sock = FakeSock(pkt(0, b"abc"))
    assert conn._read_packet() == b"abc"
