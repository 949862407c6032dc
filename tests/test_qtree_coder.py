"""Binary QueryTreeCoder (plan/qtree_coder.py) — the reference's 15
wire types (qtree_coder.cc:47-61).

Three tiers:
  * byte-layout fixtures hand-assembled from the documented reference
    encodings (GroupByNode.cc:153-171, SequentialScanNode::encode,
    CallExpressionNode::encode, SValue::encode) — the coder must emit
    exactly these bytes;
  * round-trips of builder-produced plans (parse SQL -> plan ->
    encode -> decode -> re-encode must be byte-identical, and the
    decoded plan must execute with identical results);
  * the cluster fan-out path runs over the binary default (see
    test_cluster.py, which now ships binary plans end-to-end)."""

import numpy as np
import pytest

from eventql_tpu.core.types import SType, SValue
from eventql_tpu.exec.relation import Column, Relation
from eventql_tpu.exec.runtime import RelationTableProvider, Runtime
from eventql_tpu.plan import nodes as qn
from eventql_tpu.plan import qtree_coder
from eventql_tpu.plan.coder import decode_plan, encode_plan
from eventql_tpu.plan.exprs import (
    ColumnReferenceNode,
    LiteralExpressionNode,
)


def _provider(n=500, seed=3):
    rng = np.random.default_rng(seed)
    rel = Relation(
        ["k", "v", "name"],
        [
            Column(
                SType.UINT64,
                rng.integers(0, 13, n).astype(np.uint64),
                np.ones(n, bool),
            ),
            Column(
                SType.UINT64,
                rng.integers(0, 100, n).astype(np.uint64),
                np.ones(n, bool),
            ),
            Column.from_strings(
                [f"n{i % 7}".encode() for i in range(n)]
            ),
        ],
        n,
    )
    p = RelationTableProvider()
    p.add_table("t", rel)
    return p


def _plan(sql):
    rt = Runtime()
    txn = rt.new_transaction(_provider())
    return rt.build_query_plan(txn, sql).nodes[0]


# -- byte-layout fixtures ---------------------------------------------------


def test_literal_uint64_layout():
    """wire type 8 + SValue encode: u8 type, lenenc(8-byte LE + tag)."""
    node = LiteralExpressionNode(SValue(SType.UINT64, 513, False))
    got = qtree_coder.encode(node)
    want = bytes(
        [8]  # varuint wire type: LiteralExpressionNode
        + [int(SType.UINT64)]  # SValue type byte
        + [9]  # lenenc length: 8 payload + 1 tag
        + [0x01, 0x02, 0, 0, 0, 0, 0, 0]  # 513 little-endian
        + [0]  # STag (not null)
    )
    assert got == want


def test_column_reference_layout():
    node = ColumnReferenceNode("k", SType.UINT64, 2)
    got = qtree_coder.encode(node)
    want = bytes(
        [2]  # wire type
        + [1, ord("k")]  # lenenc column name
        + [int(SType.UINT64)]
        + [1, 2]  # has-index marker u8 + varuint index
    )
    assert got == want


def test_varuint_multibyte():
    """varuint = 7-bit groups LE with continuation bit
    (outputstream.cc:120-130): 300 -> AC 02."""
    node = LiteralExpressionNode(SValue(SType.STRING, b"x" * 300, False))
    got = qtree_coder.encode(node)
    # [8][STRING][lenenc len=305 -> B1 02][u32 len 300 LE][300 bytes][tag]
    assert got[0] == 8
    assert got[1] == int(SType.STRING)
    assert got[2] == 0xB1 and got[3] == 0x02  # 305 = 0x131
    assert got[4:8] == (300).to_bytes(4, "little")


def test_groupby_layout_header():
    """GroupByNode: varuint nselect, entries, varuint ngroup, groups,
    table, u8 partial flag (GroupByNode.cc:153-171)."""
    node = _plan("select k, sum(v) from t group by k;")
    assert isinstance(node, qn.GroupByNode)
    got = qtree_coder.encode(node)
    assert got[0] == 4  # GroupByNode wire type
    assert got[1] == 2  # select list size
    assert got[2] == 12  # first entry is a SelectListNode
    assert got[-1] in (0, 1)  # partial flag trailer


# -- round trips ------------------------------------------------------------


ROUNDTRIP_SQL = [
    "select k, count(1), sum(v) from t where v < 50 group by k;",
    "select k, sum(v + 1) from t where v < 50 and k > 2 group by k;",
    "select name, count_distinct(v) from t group by name;",
    "select k, v from t where v >= 10;",
    "select k, v from t order by v desc, k limit 7 offset 2;",
    "select min(v), max(v), mean(v) from t group by k;",
    "select if(k > 5, 1, 0), count(1) from t group by if(k > 5, 1, 0);",
    "select k from t where name REGEX 'n[0-3]' group by k;",
    "select k from t where isnull(v) group by k;",
]


@pytest.mark.parametrize("sql", ROUNDTRIP_SQL)
def test_roundtrip_reencode_identical(sql):
    node = _plan(sql)
    blob = qtree_coder.encode(node)
    decoded = qtree_coder.decode(blob)
    assert qtree_coder.encode(decoded) == blob


@pytest.mark.parametrize("sql", ROUNDTRIP_SQL)
def test_roundtrip_executes_identically(sql):
    from eventql_tpu.exec.operators import execute_node

    provider = _provider()
    rt = Runtime()
    txn = rt.new_transaction(provider)
    node = rt.build_query_plan(txn, sql).nodes[0]
    want = execute_node(node, txn)
    decoded = qtree_coder.decode(qtree_coder.encode(node))
    got = execute_node(decoded, txn)
    assert got.num_rows == want.num_rows
    for cw, cg in zip(want.columns, got.columns):
        assert [cw.format_value(i) for i in range(want.num_rows)] == [
            cg.format_value(i) for i in range(got.num_rows)
        ]


def test_keyrange_rides_scan_constraints():
    """Our per-partition scoping encodes as the reference's
    ScanConstraint list (GTE + LT on the partition key) and decodes
    back to keyrange."""
    node = _plan("select k, v from t where v >= 10;")
    scan = node
    while not isinstance(scan, qn.SequentialScanNode):
        scan = scan.table
    scan.keyrange = ("k", "5", "9")
    blob = qtree_coder.encode(node)
    decoded = qtree_coder.decode(blob)
    d = decoded
    while not isinstance(d, qn.SequentialScanNode):
        d = d.table
    assert d.keyrange == ("k", "5", "9")
    # unbounded end -> only the GTE constraint
    scan.keyrange = ("k", "5", "")
    d2 = qtree_coder.decode(qtree_coder.encode(node))
    while not isinstance(d2, qn.SequentialScanNode):
        d2 = d2.table
    assert d2.keyrange == ("k", "5", "")


def test_show_describe_subquery_join_types():
    """The remaining registered wire types round-trip structurally."""
    st = qtree_coder.decode(qtree_coder.encode(qn.ShowTablesNode()))
    assert isinstance(st, qn.ShowTablesNode)
    dt = qtree_coder.decode(
        qtree_coder.encode(qn.DescribeTableNode("events"))
    )
    assert isinstance(dt, qn.DescribeTableNode)
    assert dt.table_name == "events"

    sub = _plan("select k, sum(v) from (select k, v from t) group by k;")
    blob = qtree_coder.encode(sub)
    assert qtree_coder.encode(qtree_coder.decode(blob)) == blob


def test_encode_plan_binary_default_and_json_debug(monkeypatch):
    node = _plan("select k, sum(v) from t group by k;")
    blob = encode_plan(node)
    assert isinstance(blob, bytes)
    assert blob[:1] != b"{"  # binary qtree, not JSON
    again = encode_plan(decode_plan(blob))
    assert again == blob
    # JSON debug encoding stays available and self-describes
    monkeypatch.setenv("EVENTQL_TPU_PLAN_JSON", "1")
    jblob = encode_plan(node)
    assert jblob[:1] == b"{"
    decoded = decode_plan(jblob)
    assert isinstance(decoded, qn.GroupByNode)
