"""Unified listener tests: one port serves both protocols by sniffing
the first byte ('^' = native HELLO, else HTTP — reference:
server/listener.cc:223-295)."""

import json
import urllib.request

import pytest

from eventql_tpu.db.table_service import TableService
from eventql_tpu.server.http_api import EventQLServer
from eventql_tpu.server.listener import Listener
from eventql_tpu.server.native_tcp import NativeTCPClient, NativeTCPServer


@pytest.fixture
def combined():
    svc = TableService()
    http = EventQLServer(table_service=svc).start(bind=False)
    native = NativeTCPServer(svc)  # not started: handler reused only
    lis = Listener(http, native, port=0).start()
    yield lis
    lis.stop()
    http.stop()


def test_native_on_shared_port(combined):
    c = NativeTCPClient("127.0.0.1", combined.port)
    assert c.query("select 40 + 2 as x;") == [(["x"], [["42"]])]
    c.close()


def test_http_on_shared_port(combined):
    url = f"http://127.0.0.1:{combined.port}/api/v1/sql"
    req = urllib.request.Request(
        url, data=json.dumps({"query": "select 7 as x;"}).encode()
    )
    resp = json.loads(urllib.request.urlopen(req, timeout=10).read())
    assert resp["results"][0]["rows"] == [["7"]]


def test_both_protocols_share_state(combined):
    c = NativeTCPClient("127.0.0.1", combined.port)
    c.query("CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));")
    c.insert_json("ev", ['{"t": 1, "v": 41}'])
    c.close()
    url = f"http://127.0.0.1:{combined.port}/api/v1/sql"
    req = urllib.request.Request(
        url, data=json.dumps({"query": "select sum(v) + 1 from ev;"}).encode()
    )
    resp = json.loads(urllib.request.urlopen(req, timeout=10).read())
    assert resp["results"][0]["rows"] == [["42"]]
