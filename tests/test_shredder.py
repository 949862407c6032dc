"""Record shredding / materialization tests (reference:
io/cstable/RecordShredder.cc, RecordMaterializer.cc; level semantics
follow the Dremel paper as used by cstable)."""

import numpy as np
import pytest

from eventql_tpu.columnar.shredder import (
    ShreddedTableReader,
    leaf_metas,
    materialize_records,
    shred_records,
)
from eventql_tpu.db.table_service import TableService
from eventql_tpu.exec.runtime import Runtime
from eventql_tpu.plan.nodes import ColumnDefinition


def _defs():
    return [
        ColumnDefinition("id", "uint64"),
        ColumnDefinition("tags", "string", repeated=True),
        ColumnDefinition(
            "events",
            "RECORD",
            repeated=True,
            subcolumns=[
                ColumnDefinition("time", "uint64"),
                ColumnDefinition("vals", "uint64", repeated=True),
            ],
        ),
    ]


def test_leaf_metas_levels():
    metas = {m.path: m for m in leaf_metas(_defs())}
    assert (metas["id"].rlevel_max, metas["id"].dlevel_max) == (0, 1)
    assert (metas["tags"].rlevel_max, metas["tags"].dlevel_max) == (1, 1)
    assert (metas["events.time"].rlevel_max, metas["events.time"].dlevel_max) == (1, 2)
    assert (metas["events.vals"].rlevel_max, metas["events.vals"].dlevel_max) == (2, 2)


def test_shred_repeated_scalar():
    streams = shred_records(
        _defs(),
        [
            {"id": 1, "tags": ["a", "b"]},
            {"id": 2},
            {"id": 3, "tags": ["c"]},
        ],
    )
    r, d, v, _m = streams["tags"]
    np.testing.assert_array_equal(r, [0, 1, 0, 0])
    np.testing.assert_array_equal(d, [1, 1, 0, 1])
    assert v == [b"a", b"b", b"c"]


def test_shred_nested_repeated():
    streams = shred_records(
        _defs(),
        [
            {
                "id": 1,
                "events": [
                    {"time": 10, "vals": [1, 2]},
                    {"time": 20},
                ],
            },
            {"id": 2},
        ],
    )
    r, d, v, _m = streams["events.vals"]
    # record 1: event0 vals [1,2] → (0,2),(2,2); event1 no vals → (1,1)
    # record 2: no events → (0,0)
    np.testing.assert_array_equal(r, [0, 2, 1, 0])
    np.testing.assert_array_equal(d, [2, 2, 1, 0])
    np.testing.assert_array_equal(np.asarray(v), [1, 2])
    r, d, v, _m = streams["events.time"]
    np.testing.assert_array_equal(r, [0, 1, 0])
    np.testing.assert_array_equal(d, [2, 2, 0])
    np.testing.assert_array_equal(np.asarray(v), [10, 20])


def test_materialize_roundtrip():
    records = [
        {"id": 1, "tags": ["a", "b"], "events": [{"time": 10, "vals": [1, 2]}]},
        {"id": 2},
    ]
    reader = ShreddedTableReader(_defs(), records)
    out = materialize_records(
        reader, ["id", "tags", "events.time", "events.vals"]
    )
    assert out[0]["id"] == 1
    assert out[0]["tags"] == ["a", "b"]
    assert out[0]["events"] == {"time": [10], "vals": [1, 2]}
    assert out[1] == {"id": 2}


def _svc():
    svc = TableService()
    rt = Runtime()
    txn = rt.new_transaction(svc)
    rt.build_query_plan(
        txn,
        "CREATE TABLE ev (id uint64, tags REPEATED string,"
        " events REPEATED RECORD (time uint64, vals REPEATED uint64),"
        " PRIMARY KEY (id));",
    ).execute(0)
    return svc, rt


def test_memory_table_repeated_sql():
    svc, rt = _svc()
    svc.insert_json("ev", '{"id": 1, "tags": ["x", "y"], "events": [{"time": 5, "vals": [1, 2, 3]}, {"time": 6}]}')
    svc.insert_json("ev", '{"id": 2, "tags": ["z"]}')

    txn = rt.new_transaction(svc)
    # row expansion: one output row per repeated value
    plan = rt.build_query_plan(txn, "select id, tags from ev;")
    rows = plan.execute(0).rows
    assert rows == [["1", "x"], ["1", "y"], ["2", "z"]]

    # WITHIN RECORD aggregation over nested repeated values
    plan = rt.build_query_plan(
        txn, "select id, sum(`events.vals`) WITHIN RECORD from ev;"
    )
    rows = plan.execute(0).rows
    assert rows == [["1", "6"], ["2", "0"]]

    # count of a repeated column counts values
    plan = rt.build_query_plan(txn, "select count(tags) from ev;")
    assert plan.execute(0).rows == [["3"]]


def test_insert_unknown_column_still_errors():
    svc, rt = _svc()
    from eventql_tpu.core.errors import RuntimeError_

    with pytest.raises(RuntimeError_):
        svc.insert_json("ev", '{"id": 1, "bogus": 2}')
