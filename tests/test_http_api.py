"""HTTP API tests (reference surface: transport/http/api_servlet.cc)."""

import json
import urllib.request

import pytest

from eventql_tpu.server.http_api import EventQLServer


@pytest.fixture
def server():
    s = EventQLServer(port=0).start()
    yield s
    s.stop()


def _req(server, path, payload=None, method=None):
    url = f"http://127.0.0.1:{server.port}{path}"
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read() or b"{}")
    except urllib.error.HTTPError as e:
        body = e.read()
        try:
            return e.code, json.loads(body)
        except json.JSONDecodeError:
            return e.code, {"raw": body.decode()}


def test_sql_roundtrip(server):
    status, out = _req(server, "/api/v1/sql", {"query": "select 1 + 2 as three;"})
    assert status == 200
    assert out == {
        "results": [{"type": "table", "columns": ["three"], "rows": [["3"]]}]
    }


def test_sql_get_param(server):
    status, out = _req(server, "/api/v1/sql?query=select%2042;")
    assert status == 200
    assert out["results"][0]["rows"] == [["42"]]


def test_sql_error(server):
    status, out = _req(server, "/api/v1/sql", {"query": "select ;"})
    assert status == 500
    assert out["error"] == "unexpected token T_SEMICOLON, expected: value expression"


def test_table_lifecycle(server):
    status, _ = _req(
        server,
        "/api/v1/tables/create",
        {
            "table": "events",
            "schema": {
                "columns": [
                    {"name": "time", "type": "DATETIME"},
                    {"name": "value", "type": "UINT64"},
                    {"name": "label", "type": "STRING"},
                ]
            },
            "primary_key": ["time"],
        },
    )
    assert status == 201

    status, out = _req(server, "/api/v1/tables/list", {})
    assert status == 200
    assert {"name": "events"} in out["tables"]

    status, _ = _req(
        server,
        "/api/v1/tables/insert",
        [
            {"table": "events", "data": {"time": 1, "value": 10, "label": "a"}},
            {"table": "events", "data": {"time": 2, "value": 32, "label": "a"}},
        ],
    )
    assert status == 201

    status, out = _req(
        server,
        "/api/v1/sql",
        {"query": "select label, sum(value) from events group by label;"},
    )
    assert out["results"][0]["rows"] == [["a", "42"]]

    status, out = _req(server, "/api/v1/tables/describe?table=events")
    assert status == 200
    names = [c["column_name"] for c in out["table"]["columns"]]
    assert names == ["time", "value", "label"]

    status, _ = _req(server, "/api/v1/tables/drop", {"table": "events"})
    assert status == 201
    status, out = _req(server, "/api/v1/tables/list", {})
    assert out["tables"] == []


def test_stats(server):
    _req(server, "/api/v1/sql", {"query": "select 1;"})
    status, out = _req(server, "/eventql/stats")
    assert status == 200
    assert out["num_queries"] >= 1


def test_sql_json_sse_stream(server):
    """SSE framing contract the node driver's inline parser relies on:
    `event: result` + data lines, frame terminated by a blank line."""
    url = (
        f"http://127.0.0.1:{server.port}/api/v1/sql"
        "?format=json_sse&query=select%201%20%2b%202%20as%20three;"
    )
    with urllib.request.urlopen(url) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "text/event-stream"
        body = resp.read().decode()
    frames = [f for f in body.split("\n\n") if f.strip()]
    assert len(frames) == 1
    lines = frames[0].split("\n")
    assert lines[0] == "event: result"
    data = "\n".join(l[len("data: "):] for l in lines[1:] if l.startswith("data: "))
    out = json.loads(data)
    assert out["results"][0]["rows"] == [["3"]]


def test_status_dashboard(server):
    """Human status pages (reference: status_servlet.cc)."""
    _req(server, "/api/v1/tables/create", {
        "table": "dash", "schema": {"columns": [{"name": "a", "type": "UINT64"}]},
    })
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/eventql/"
    ) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("text/html")
        body = resp.read().decode()
    assert "eventql_tpu v0.1" in body
    assert "Number of Tables: 1" in body
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/eventql/db/default/dash"
    ) as resp:
        body = resp.read().decode()
    assert "dash: a UINT64" in body


def test_evql_driver_remote(server):
    """EVQL.connect drives /api/v1/mapreduce/execute remotely
    (prelude.js → mapreduce_servlet.cc surface)."""
    from eventql_tpu.mapreduce.api import EVQL

    _req(server, "/api/v1/tables/create", {
        "table": "mre", "schema": {"columns": [
            {"name": "k", "type": "STRING"}, {"name": "v", "type": "UINT64"}]},
    })
    _req(server, "/api/v1/tables/insert", [
        {"table": "mre", "data": {"k": "x", "v": 1}},
        {"table": "mre", "data": {"k": "x", "v": 2}},
        {"table": "mre", "data": {"k": "y", "v": 5}},
    ])
    evql = EVQL.connect("127.0.0.1", server.port)
    m = evql.map_table(table="mre", map_fn="""
def map_fn(row):
    return [(row["k"], row["v"])]
""")
    r = evql.reduce(sources=[m], reduce_fn="""
def reduce_fn(key, values):
    return [(key, sum(int(v) for v in values))]
""")
    out = evql.download_results([r])
    got = dict(out[0])
    assert got == {"x": "3", "y": "5"}


def test_mapreduce_js_program_sse(server):
    """POSTing a JavaScript job program to /api/v1/mapreduce/execute
    streams SSE events (reference: mapreduce_servlet.cc:340-460 —
    job_started / result / log / job_finished; results url-encoded)."""
    from urllib.parse import unquote

    _req(server, "/api/v1/tables/create", {
        "table": "mrjs", "schema": {"columns": [
            {"name": "k", "type": "STRING"}, {"name": "v", "type": "UINT64"}]},
    })
    _req(server, "/api/v1/tables/insert", [
        {"table": "mrjs", "data": {"k": "x", "v": 1}},
        {"table": "mrjs", "data": {"k": "x", "v": 2}},
        {"table": "mrjs", "data": {"k": "y", "v": 5}},
    ])
    program = """
    EVQL.log("mapping mrjs");
    var m = EVQL.mapTable({
      table: "mrjs",
      map_fn: function(row) { return [[row.k, parseInt(row.v, 10)]]; },
    });
    var r = EVQL.reduce({
      sources: [m], shards: 1,
      reduce_fn: function(key, values) {
        var s = 0;
        while (values.hasNext()) { s += parseInt(values.next(), 10); }
        return [[key, s]];
      },
    });
    EVQL.downloadResults([r]);
    """
    url = f"http://127.0.0.1:{server.port}/api/v1/mapreduce/execute"
    req = urllib.request.Request(url, data=program.encode())
    with urllib.request.urlopen(req) as resp:
        assert resp.headers["Content-Type"].startswith("text/event-stream")
        body = resp.read().decode()

    events = []
    cur_event = None
    for line in body.split("\n"):
        if line.startswith("event: "):
            cur_event = line[len("event: "):]
        elif line.startswith("data: "):
            events.append((cur_event, line[len("data: "):]))
    kinds = [e for e, _ in events]
    assert kinds[0] == "job_started"
    assert kinds[-1] == "job_finished"
    assert ("log", "mapping%20mrjs") in events
    results = [json.loads(unquote(d)) for e, d in events if e == "result"]
    got = {r["key"]: json.loads(r["value"]) for r in results}
    assert got == {"x": 3, "y": 5}


def test_add_and_remove_field(server):
    """POST /api/v1/tables/add_field + remove_field
    (reference: api_servlet.cc:513-660)."""
    _req(server, "/api/v1/tables/create", {
        "table": "alt", "schema": {"columns": [
            {"name": "k", "type": "STRING"}]},
    })
    status, _ = _req(server, "/api/v1/tables/add_field", {
        "table": "alt", "field_name": "extra", "field_type": "UINT64"})
    assert status == 201
    status, out = _req(server, "/api/v1/tables/describe?table=alt", {})
    cols = [c["column_name"] for c in out["table"]["columns"]]
    assert "extra" in cols

    status, _ = _req(server, "/api/v1/tables/remove_field", {
        "table": "alt", "field_name": "extra"})
    assert status == 201
    status, out = _req(server, "/api/v1/tables/describe?table=alt", {})
    cols = [c["column_name"] for c in out["table"]["columns"]]
    assert "extra" not in cols

    status, out = _req(server, "/api/v1/tables/add_field", {
        "table": "alt", "field_name": "x"})
    assert status == 500 and "field_type" in out["error"]


def test_sql_json_sse_sequential_statement_semantics(server):
    """A multi-statement SSE request must execute statements IN ORDER:
    a SELECT before an INSERT must not see the inserted row, and a
    SELECT after it must (building every cursor upfront used to run
    the eager INSERT before the lazy first SELECT's rows)."""
    _req(server, "/api/v1/tables/create", {
        "table": "sseq",
        "schema": {"columns": [
            {"name": "id", "type": "UINT64"},
            {"name": "v", "type": "UINT64"},
        ]},
    })
    _req(server, "/api/v1/tables/insert", [
        {"table": "sseq", "data": {"id": 1, "v": 10}},
        {"table": "sseq", "data": {"id": 2, "v": 20}},
    ])
    q = (
        "select count(1) from sseq;"
        " insert into sseq (id, v) values (3, 30);"
        " select count(1) from sseq;"
    )
    url = (
        f"http://127.0.0.1:{server.port}/api/v1/sql"
        "?format=json_sse&query=" + urllib.parse.quote(q)
    )
    with urllib.request.urlopen(url) as resp:
        body = resp.read().decode()
    frames = [f for f in body.split("\n\n") if f.strip()]
    lines = frames[0].split("\n")
    data = "\n".join(
        l[len("data: "):] for l in lines[1:] if l.startswith("data: ")
    )
    out = json.loads(data)
    assert out["results"][0]["rows"] == [["2"]]  # pre-insert count
    assert out["results"][2]["rows"] == [["3"]]  # post-insert count
