"""Cross-process distributed execution tests.

Models the reference's cluster query flow: a coordinator ships encoded
partial-aggregate plans to worker servers over the native TCP protocol
(QUERY_PARTIALAGGR, reference: transport/native/ops/query_partialaggr.cc)
and merges their partials (GroupByMergeExpression, groupby.cc:504-637);
non-distributable shapes pull rows via QUERY_REMOTE instead
(query_remote.cc).
"""

import numpy as np
import pytest

from eventql_tpu.db.table_service import TableService
from eventql_tpu.exec.runtime import Runtime
from eventql_tpu.parallel.cluster import (
    ClusterTableProvider,
    partial_from_bytes,
    partial_to_bytes,
    relation_from_bytes,
    relation_to_bytes,
)
from eventql_tpu.server.native_tcp import NativeTCPClient, NativeTCPServer

SCHEMA = (
    "CREATE TABLE ev (t uint64, dim string, v uint64, x double,"
    " PRIMARY KEY (t));"
)


def _mkworker(rows):
    svc = TableService()
    server = NativeTCPServer(svc, port=0).start()
    c = NativeTCPClient("127.0.0.1", server.port)
    c.query(SCHEMA)
    c.insert_json("ev", rows)
    c.close()
    return server


@pytest.fixture
def cluster():
    # two workers with disjoint row sets of the same table
    w1 = _mkworker(
        [
            '{"t": 1, "dim": "a", "v": 10, "x": 1.5}',
            '{"t": 2, "dim": "b", "v": 20, "x": 2.5}',
            '{"t": 3, "dim": "a", "v": 30, "x": 3.0}',
        ]
    )
    w2 = _mkworker(
        [
            '{"t": 4, "dim": "b", "v": 40, "x": 4.0}',
            '{"t": 5, "dim": "c", "v": 50, "x": 0.5}',
        ]
    )
    provider = ClusterTableProvider(
        [("127.0.0.1", w1.port), ("127.0.0.1", w2.port)]
    )
    yield provider
    provider.close()
    w1.stop()
    w2.stop()


def _run(provider, sql):
    rt = Runtime()
    txn = rt.new_transaction(provider)
    plan = rt.build_query_plan(txn, sql)
    return plan.execute(0).rows


def test_cluster_describe(cluster):
    info = cluster.describe("ev")
    assert info is not None
    assert [c[0] for c in info.columns] == ["t", "dim", "v", "x"]


def test_distributed_group_by_sum_count(cluster):
    rows = _run(
        cluster,
        "select dim, sum(v), count(1) from ev group by dim order by dim;",
    )
    assert rows == [
        ["a", "40", "2"],
        ["b", "60", "2"],
        ["c", "50", "1"],
    ]


def test_distributed_global_aggregate(cluster):
    rows = _run(cluster, "select sum(v), count(1), max(x), min(v) from ev;")
    assert rows == [["150", "5", "4.000000", "10"]]


def test_distributed_mean_merges_weighted(cluster):
    # mean must merge as (sum, count) across shards — worker means alone
    # would be 20 and 45, but the true mean is 150/5 = 30
    rows = _run(cluster, "select mean(v) from ev;")
    assert rows == [["30.000000"]]


def test_distributed_group_by_with_where(cluster):
    rows = _run(
        cluster,
        "select dim, sum(v) from ev where v >= 20 group by dim order by dim;",
    )
    assert rows == [["a", "30"], ["b", "60"], ["c", "50"]]


def test_remote_scan_fallback(cluster):
    # plain scans aren't partial-aggregatable: rows stream back via
    # QUERY_REMOTE and execute on the coordinator
    rows = _run(cluster, "select t, v from ev order by t;")
    assert rows == [
        ["1", "10"],
        ["2", "20"],
        ["3", "30"],
        ["4", "40"],
        ["5", "50"],
    ]


def test_remote_scan_string_columns(cluster):
    rows = _run(
        cluster, "select dim from ev where v = 50;"
    )
    assert rows == [["c"]]


def test_partial_roundtrip_bytes(cluster):
    # serialize → deserialize a worker partial, exact reconstruction
    from eventql_tpu.exec.operators import _exec_group_by_local
    from eventql_tpu.plan import nodes as qn

    rt = Runtime()
    txn = rt.new_transaction(cluster)
    plan = rt.build_query_plan(
        txn, "select dim, sum(v), mean(x) from ev group by dim;"
    )
    node = plan.nodes[0]
    while not isinstance(node, qn.GroupByNode):
        node = node.table if hasattr(node, "table") else node.subquery
    rel = cluster.get_table_data("ev")
    partial = _exec_group_by_local(node, rel)
    blob = partial_to_bytes(partial)
    from eventql_tpu.parallel.cluster import _make_template_partial

    back = partial_from_bytes(blob, _make_template_partial(node))
    assert back.n_groups == partial.n_groups
    for a, b in zip(partial.key_cols, back.key_cols):
        np.testing.assert_array_equal(a.data, b.data)


def test_relation_roundtrip_bytes(cluster):
    rel = cluster.get_table_data("ev")
    back = relation_from_bytes(relation_to_bytes(rel))
    assert back.num_rows == rel.num_rows
    assert back.names == rel.names
    for a, b in zip(rel.columns, back.columns):
        np.testing.assert_array_equal(a.data, b.data)
        np.testing.assert_array_equal(a.valid, b.valid)


def test_plan_coder_roundtrip(cluster):
    from eventql_tpu.plan import nodes as qn
    from eventql_tpu.plan.coder import decode_plan, encode_plan

    rt = Runtime()
    txn = rt.new_transaction(cluster)
    plan = rt.build_query_plan(
        txn,
        "select dim, sum(v * 2) from ev where x > 1.0 group by dim;",
    )
    node = plan.nodes[0]
    while not isinstance(node, qn.GroupByNode):
        node = node.table if hasattr(node, "table") else node.subquery
    back = decode_plan(encode_plan(node))
    assert [sl.expr.to_sql() for sl in back.select_list] == [
        sl.expr.to_sql() for sl in node.select_list
    ]
    assert back.table.where_expr.to_sql() == node.table.where_expr.to_sql()


def test_partialaggr_server_side_cache(tmp_path):
    """Partition servers cache partial-aggregate results keyed by plan
    + table data version (reference: QueryCache on PartialGroupBy,
    groupby.cc:255-295,411-432); mutations invalidate."""
    import os

    from eventql_tpu.exec.query_cache import QueryCache

    svc = TableService()
    cache = QueryCache(str(tmp_path / "qcache"))
    server = NativeTCPServer(svc, port=0, query_cache=cache).start()
    try:
        c = NativeTCPClient("127.0.0.1", server.port)
        c.query(SCHEMA)
        c.insert_json("ev", ['{"t": 1, "dim": "a", "v": 10, "x": 1.0}',
                             '{"t": 2, "dim": "b", "v": 20, "x": 2.0}'])
        provider = ClusterTableProvider([("127.0.0.1", server.port)])
        sql = "select dim, sum(v) from ev group by dim order by dim;"
        assert _run(provider, sql) == [["a", "10"], ["b", "20"]]
        blobs = [f for f in os.listdir(str(tmp_path / "qcache"))
                 if f.endswith(".bin")]
        assert len(blobs) == 1

        # cache hit: same result, no new entry
        assert _run(provider, sql) == [["a", "10"], ["b", "20"]]
        assert len([f for f in os.listdir(str(tmp_path / "qcache"))
                    if f.endswith(".bin")]) == 1

        # mutation bumps the version: fresh entry, fresh data visible
        c.insert_json("ev", ['{"t": 3, "dim": "a", "v": 5, "x": 0.5}'])
        assert _run(provider, sql) == [["a", "15"], ["b", "20"]]
        assert len([f for f in os.listdir(str(tmp_path / "qcache"))
                    if f.endswith(".bin")]) == 2
        c.close()
        provider.close()
    finally:
        server.stop()


def test_partialaggr_cache_not_reused_across_restarts(tmp_path):
    """table_version embeds a per-process boot epoch: reopening a
    datadir resets the in-memory mutation counter, and without the
    epoch a restarted server would serve pre-restart cache entries for
    post-restart data."""
    import importlib

    from eventql_tpu.db import table_service as ts_mod

    svc = TableService()
    svc.create_table.__self__  # noqa: B018 — svc exists
    from eventql_tpu.plan.nodes import ColumnDefinition, CreateTableNode

    svc.create_table(
        CreateTableNode(
            "t", [ColumnDefinition("k", "UINT64")], [], None, []
        )
    )
    v1 = svc.table_version("t")
    assert v1.endswith("-0") and "-" in v1
    svc.insert_json("t", '{"k": 1}')
    assert svc.table_version("t") != v1
    # a different boot epoch (simulated restart) never repeats versions
    old_epoch = ts_mod._BOOT_EPOCH
    try:
        ts_mod._BOOT_EPOCH = "fffffffffff0"
        assert svc.table_version("t").split("-")[0] != old_epoch
    finally:
        ts_mod._BOOT_EPOCH = old_epoch


def test_cluster_exec_stats_rows_scanned(cluster):
    """Shard partials carry their worker's rows_scanned back to the
    coordinator's ExecutionContext, and each shard completes one task
    (VERDICT round-3 #8; reference defines the wire fields but zeroes
    them, frames/query_progress.cc:63-70)."""
    rt = Runtime()
    txn = rt.new_transaction(cluster)
    cluster.exec_ctx = txn.exec_ctx
    plan = rt.build_query_plan(
        txn, "select dim, sum(v) from ev group by dim;"
    )
    plan.execute(0)
    snap = txn.exec_ctx.snapshot()
    # both workers scanned their full table: 3 + 2 rows
    assert snap["rows_scanned"] == 5, snap
    assert snap["num_tasks"] == 2 and snap["num_tasks_completed"] == 2
    assert txn.exec_ctx.progress_permill() == 1000


def test_native_client_result_stats(cluster):
    """QUERY_RESULT stats varints carry real values; the python client
    surfaces them as last_result_stats (reference field order,
    frames/query_result.cc:78-82)."""
    from eventql_tpu.parallel.partitioned import _concat_columns  # noqa

    # single-node: local TableService over the wire
    svc = TableService()
    server = NativeTCPServer(svc, port=0).start()
    try:
        c = NativeTCPClient("127.0.0.1", server.port)
        c.query(SCHEMA)
        c.insert_json(
            "ev",
            ['{"t": %d, "dim": "a", "v": 1, "x": 0.5}' % i for i in range(7)],
        )
        c.query("select dim, sum(v) from ev group by dim;")
        stats = c.last_result_stats
        assert stats["rows_scanned"] == 7, stats
        assert stats["bytes_scanned"] > 0
        c.close()
    finally:
        server.stop()
