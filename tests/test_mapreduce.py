"""MapReduce service tests (reference surface:
mapreduce/mapreduce_service.h, task DAG mapreduce_task_builder.cc)."""

import numpy as np
import pytest

from eventql_tpu.core.types import SType, SValue
from eventql_tpu.db.table_service import TableService
from eventql_tpu.exec.runtime import Runtime
from eventql_tpu.mapreduce.service import MapReduceService
from eventql_tpu.plan.nodes import ColumnDefinition, CreateTableNode


@pytest.fixture
def svc():
    ts = TableService()
    ts.create_table(
        CreateTableNode(
            "events",
            [
                ColumnDefinition("id", "UINT64"),
                ColumnDefinition("user", "STRING"),
                ColumnDefinition("value", "UINT64"),
            ],
            # the pk must be unique per row: duplicate-pk inserts are
            # upserts (newest wins), matching the reference's
            # record-version semantics
            ["id"],
            None,
            [],
        )
    )
    for i, (user, value) in enumerate([
        ("a", 1), ("b", 2), ("a", 3), ("c", 4), ("b", 5), ("a", 6),
    ]):
        ts.insert(
            "events",
            ["id", "user", "value"],
            [
                SValue.new_uint64(i),
                SValue.new_string(user),
                SValue.new_uint64(value),
            ],
        )
    return ts


MAP_FN = """
def map_fn(row):
    return [(row["user"], row["value"])]
"""

REDUCE_FN = """
def reduce_fn(key, values):
    return [(key, sum(int(v) for v in values))]
"""


def test_map_reduce_pipeline(svc):
    mr = MapReduceService(svc)
    out = mr.execute(
        {
            "jobs": {
                "m": {"op": "map_table", "table": "events", "map_fn": MAP_FN},
                "r": {
                    "op": "reduce",
                    "sources": ["m"],
                    "reduce_fn": REDUCE_FN,
                    "num_shards": 4,
                },
                "res": {"op": "return_results", "sources": ["r"]},
            },
            "execute": ["res"],
        }
    )
    assert sorted(out[0]) == [("a", "10"), ("b", "7"), ("c", "4")]


def test_save_to_table_and_query(svc):
    mr = MapReduceService(svc)
    mr.execute(
        {
            "jobs": {
                "m": {"op": "map_table", "table": "events", "map_fn": MAP_FN},
                "r": {"op": "reduce", "sources": ["m"], "reduce_fn": REDUCE_FN},
                "save": {
                    "op": "save_to_table",
                    "sources": ["r"],
                    "table": "user_totals",
                },
            },
            "execute": ["save"],
        }
    )
    rt = Runtime()
    txn = rt.new_transaction(svc)
    # `key` is a reserved word (tokenize.cc keyword list) — backtick-quote
    r = rt.build_query_plan(
        txn, "select `key`, `value` from user_totals order by `key`;"
    ).execute(0)
    assert r.rows == [["a", "10"], ["b", "7"], ["c", "4"]]


def test_lambda_functions(svc):
    mr = MapReduceService(svc)
    out = mr.execute(
        {
            "jobs": {
                "m": {
                    "op": "map_table",
                    "table": "events",
                    "map_fn": 'lambda row: [("n", 1)]',
                },
                "r": {
                    "op": "reduce",
                    "sources": ["m"],
                    "reduce_fn": "lambda k, vs: [(k, sum(int(v) for v in vs))]",
                },
            },
            "execute": ["r"],
        }
    )
    assert out[0] == [("n", "6")]


def test_evql_driver_api(svc):
    """The prelude-style job-builder surface (reference:
    mapreduce/prelude.js EVQL.mapTable/reduce/join/downloadResults)."""
    from eventql_tpu.mapreduce.api import EVQL

    evql = EVQL(MapReduceService(svc))
    m = evql.map_table(table="events", map_fn=MAP_FN)
    r = evql.reduce(sources=[m], reduce_fn=REDUCE_FN)
    out = evql.download_results([r])
    assert len(out) == 1
    got = dict(out[0])
    assert set(got) == {"a", "b", "c"}
    assert int(got["a"]) == 10


def test_evql_driver_join(svc):
    """EVQL.join merges the values of a key into one dict
    (prelude.js:238-268)."""
    import json as _json

    from eventql_tpu.mapreduce.api import EVQL

    evql = EVQL(MapReduceService(svc))
    m1 = evql.map_table(
        table="events",
        map_fn="""
def map_a(row):
    import json
    return [(row["user"], json.dumps({"v": int(row["value"])}))]
""",
    )
    m2 = evql.map_table(
        table="events",
        map_fn="""
def map_b(row):
    import json
    return [(row["user"], json.dumps({"u": row["user"]}))]
""",
    )
    j = evql.join(sources=[m1, m2])
    out = evql.download_results([j])
    got = {k: _json.loads(v) for k, v in out[0]}
    assert set(got) == {"a", "b", "c"}
    for k, v in got.items():
        assert v["u"] == k and "v" in v


def test_evql_driver_save_to_table(svc):
    from eventql_tpu.mapreduce.api import EVQL

    evql = EVQL(MapReduceService(svc))
    m = evql.map_table(table="events", map_fn=MAP_FN)
    r = evql.reduce(sources=[m], reduce_fn=REDUCE_FN)
    evql.save_to_table("evql_api_out", [r])
    rel = svc.get_table_data("evql_api_out")
    assert rel.num_rows == 3


JS_PROGRAM = """
var scale = 1;
EVQL.broadcast("scale");  // non-function globals need explicit broadcast

function count_map(row) {
  return [[row.user, parseInt(row.value, 10) * scale]];
}

var mapped = EVQL.mapTable({
  table: "events",
  map_fn: count_map,
});

var reduced = EVQL.reduce({
  sources: [mapped],
  shards: 2,
  reduce_fn: function(key, values) {
    var sum = 0;
    while (values.hasNext()) {
      sum += parseInt(values.next(), 10);
    }
    return [[key, sum]];
  },
});

EVQL.downloadResults([reduced]);
"""


def test_js_program_end_to_end(svc):
    """A reference-shaped JavaScript job program runs unmodified
    (reference: MapReduceService::executeScript + prelude.js API)."""
    mr = MapReduceService(svc)
    results, logs = mr.execute_script(JS_PROGRAM)
    got = {k: int(v) for k, v in results}
    assert got == {"a": 10, "b": 7, "c": 4}


def test_js_program_broadcast_globals(svc):
    """Global functions/vars auto-broadcast into worker contexts
    (prelude.js autoBroadcast + EVQL.broadcast)."""
    mr = MapReduceService(svc)
    program = """
    var factor = 100;
    EVQL.broadcast("factor");
    function weight(v) { return v * factor; }
    var m = EVQL.mapTable({
      table: "events",
      map_fn: function(row) {
        return [[row.user, weight(parseInt(row.value, 10))]];
      },
    });
    EVQL.downloadResults([m]);
    """
    results, _ = mr.execute_script(program)
    got = {}
    for k, v in results:
        got[k] = got.get(k, 0) + int(v)
    assert got == {"a": 1000, "b": 700, "c": 400}


def test_js_program_serialize_fn(svc):
    """downloadResults(sources, serialize_fn) post-processes tuples
    (return_results.cc:83-108: non-empty results only, raw strings)."""
    mr = MapReduceService(svc)
    program = """
    var m = EVQL.mapTable({
      table: "events",
      map_fn: function(row) { return [[row.user, 1]]; },
    });
    EVQL.downloadResults([m], function(key, value) {
      if (key == "c") return "";
      return key + "=" + value;
    });
    """
    results, _ = mr.execute_script(program)
    assert all(k == "" for k, _ in results)
    vals = sorted(v for _, v in results)
    assert vals == ["a=1", "a=1", "a=1", "b=1", "b=1"]


def test_js_program_join(svc):
    """EVQL.join with a post-map fn (prelude join semantics: values
    JSON-merged per key, then map_fn applied via params)."""
    mr = MapReduceService(svc)
    program = """
    var m1 = EVQL.mapTable({
      table: "events",
      map_fn: function(row) {
        return [[row.user, {v: parseInt(row.value, 10)}]];
      },
    });
    var m2 = EVQL.mapTable({
      table: "events",
      map_fn: function(row) {
        return [[row.user, {u: row.user}]];
      },
    });
    var j = EVQL.join({
      sources: [m1, m2],
      shards: 1,
      map_fn: function(joined) {
        return [[joined.u, joined.v]];
      },
    });
    EVQL.downloadResults([j]);
    """
    results, _ = mr.execute_script(program)
    got = dict(results)
    assert set(got) == {"a", "b", "c"}


def test_js_program_save_to_table(svc):
    mr = MapReduceService(svc)
    program = """
    var m = EVQL.mapTable({
      table: "events",
      map_fn: function(row) { return [[row.user, row.value]]; },
    });
    EVQL.saveToTable({table: "js_mr_out", sources: [m]});
    """
    mr.execute_script(program)
    rel = svc.get_table_data("js_mr_out")
    assert rel.num_rows > 0


def test_js_program_logging(svc):
    mr = MapReduceService(svc)
    program = """
    EVQL.log("starting", 42);
    console.log("via console");
    var m = EVQL.mapTable({
      table: "events",
      map_fn: function(row) { return []; },
    });
    EVQL.downloadResults([m]);
    """
    results, logs = mr.execute_script(program)
    assert results == []
    assert "starting, 42" in logs
    assert "via console" in logs
