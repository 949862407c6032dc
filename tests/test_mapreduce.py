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
                ColumnDefinition("user", "STRING"),
                ColumnDefinition("value", "UINT64"),
            ],
            ["user"],
            None,
            [],
        )
    )
    for user, value in [
        ("a", 1), ("b", 2), ("a", 3), ("c", 4), ("b", 5), ("a", 6),
    ]:
        ts.insert(
            "events",
            ["user", "value"],
            [SValue.new_string(user), SValue.new_uint64(value)],
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
