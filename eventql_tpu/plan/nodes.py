"""Logical query-plan nodes (the "qtree" layer).

Mirrors the reference's typed query tree (reference: sql/qtree/*) —
one node class per relational operator, with the same column-resolution
machinery: resolving a column name against a node may append a hidden
"internal" select-list entry (used by ORDER BY / GROUP BY on columns
that are not part of the visible output; reference:
SequentialScanNode.cc:211-238, GroupByNode.cc:75-104,
SubqueryNode.cc:101-134). The visible output is the prefix named by
`result_columns`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from eventql_tpu.core.errors import RuntimeError_
from eventql_tpu.core.types import SType
from eventql_tpu.plan.exprs import ColumnReferenceNode, ValueExpressionNode

NOT_FOUND = -1


@dataclass
class QualifiedColumn:
    qualified_name: str
    short_name: str
    stype: SType


class SelectListEntry:
    """A select-list item: expression + optional alias
    (reference: sql/qtree/SelectListNode.cc)."""

    def __init__(self, expr: ValueExpressionNode, alias: Optional[str] = None):
        self.expr = expr
        self.alias = alias

    def column_name(self) -> str:
        if self.alias is not None:
            return self.alias
        return self.expr.to_sql()

    def __repr__(self):
        return f"SelectListEntry({self.expr!r}, alias={self.alias!r})"


class QueryTreeNode:
    pass


class TableExpressionNode(QueryTreeNode):
    """Base for relational operators."""

    def get_result_columns(self) -> List[str]:
        raise NotImplementedError

    def get_available_columns(self) -> List[QualifiedColumn]:
        raise NotImplementedError

    def get_computed_column_index(self, name: str, allow_add: bool = False) -> int:
        raise NotImplementedError

    def get_column_type(self, idx: int) -> SType:
        raise NotImplementedError

    def get_computed_column_info(self, name: str, allow_add: bool = False):
        idx = self.get_computed_column_index(name, allow_add)
        if idx == NOT_FOUND:
            return (NOT_FOUND, SType.NIL)
        return (idx, self.get_column_type(idx))


class SequentialScanNode(TableExpressionNode):
    """Scan of a named table with projection + WHERE filter
    (reference: sql/qtree/SequentialScanNode.cc)."""

    NO_AGGREGATION = "NO_AGGREGATION"
    AGGREGATE_ALL = "AGGREGATE_ALL"
    AGGREGATE_WITHIN_RECORD_FLAT = "AGGREGATE_WITHIN_RECORD_FLAT"
    AGGREGATE_WITHIN_RECORD_DEEP = "AGGREGATE_WITHIN_RECORD_DEEP"

    def __init__(self, table_name: str, table_columns: List[Tuple[str, SType]]):
        self.table_name = table_name
        self.table_alias = ""
        self.table_columns = list(table_columns)  # (name, type) of real table
        self.input_columns: List[Tuple[str, SType]] = []  # referenced columns
        self.select_list: List[SelectListEntry] = []
        self.output_columns: List[str] = []
        self.where_expr: Optional[ValueExpressionNode] = None
        self.aggr_strategy = self.NO_AGGREGATION
        # partition scoping for distributed execution: restrict the scan
        # to rows with begin <= column < end ("" = unbounded); set by the
        # coordinator when it picks one replica per partition
        # (reference: per-partition subtrees, server/sql/scheduler.cc)
        self.keyrange: Optional[tuple] = None  # (column, begin, end)

    # -- naming ---------------------------------------------------------
    def normalize_column_name(self, column_name: str) -> str:
        # reference: SequentialScanNode::normalizeColumnName
        if self.table_name and column_name.startswith(self.table_name + "."):
            return column_name[len(self.table_name) + 1 :]
        if self.table_alias and column_name.startswith(self.table_alias + "."):
            return column_name[len(self.table_alias) + 1 :]
        return column_name

    # -- input columns (the physical columns the scan reads) ------------
    def get_input_column_index(self, column_name: str, allow_add: bool = False) -> int:
        col = self.normalize_column_name(column_name)
        for i, (name, _t) in enumerate(self.input_columns):
            if name == col:
                return i
        if not allow_add:
            return NOT_FOUND
        for name, t in self.table_columns:
            if name == col:
                self.input_columns.append((col, t))
                return len(self.input_columns) - 1
        return NOT_FOUND

    def get_input_column_type(self, idx: int) -> SType:
        if idx >= len(self.input_columns):
            raise RuntimeError_(f"invalid column index: '{idx}'")
        return self.input_columns[idx][1]

    def get_input_column_info(self, column_name: str, allow_add: bool = False):
        idx = self.get_input_column_index(column_name, allow_add)
        if idx == NOT_FOUND:
            return (NOT_FOUND, SType.NIL)
        return (idx, self.get_input_column_type(idx))

    # -- computed (output) columns --------------------------------------
    def add_select_list(self, entry: SelectListEntry):
        self.output_columns.append(entry.column_name())
        self.select_list.append(entry)

    def get_computed_column_index(self, column_name: str, allow_add: bool = False) -> int:
        col = self.normalize_column_name(column_name)
        col_with_name = f"{self.table_name}.{col}"
        col_with_alias = f"{self.table_alias}.{col}"
        for i, sl in enumerate(self.select_list):
            n = sl.column_name()
            if (
                n == col
                or (self.table_name and n == col_with_name)
                or (self.table_alias and n == col_with_alias)
            ):
                return i
        input_idx = self.get_input_column_index(col, allow_add)
        if input_idx != NOT_FOUND:
            entry = SelectListEntry(
                ColumnReferenceNode(col, self.get_input_column_type(input_idx), input_idx),
                alias=column_name,
            )
            # internal column: select_list only, not output_columns
            self.select_list.append(entry)
            return len(self.select_list) - 1
        return NOT_FOUND

    def get_column_type(self, idx: int) -> SType:
        return self.select_list[idx].expr.return_type()

    def get_result_columns(self) -> List[str]:
        return list(self.output_columns)

    def get_available_columns(self) -> List[QualifiedColumn]:
        qualifier = (self.table_alias or self.table_name) + "."
        return [
            QualifiedColumn(qualifier + name, name, t)
            for name, t in self.table_columns
        ]

    def normalize_column_names(self):
        # reference: SequentialScanNode::normalizeColumnNames — strips
        # table-name/alias prefixes from column refs, rebuilds output names
        def walk(expr):
            if isinstance(expr, ColumnReferenceNode) and expr.column_name:
                expr.column_name = self.normalize_column_name(expr.column_name)
            for a in expr.arguments():
                walk(a)

        self.output_columns = []
        for sl in self.select_list:
            walk(sl.expr)
            self.output_columns.append(sl.column_name())
        if self.where_expr is not None:
            walk(self.where_expr)


class SelectExpressionNode(TableExpressionNode):
    """Tableless SELECT of constant expressions
    (reference: sql/qtree/SelectExpressionNode.cc)."""

    def __init__(self, select_list: List[SelectListEntry]):
        self.select_list = select_list
        self.column_names = [sl.column_name() for sl in select_list]

    def get_result_columns(self):
        return list(self.column_names)

    def get_available_columns(self):
        return [
            QualifiedColumn(n, n, sl.expr.return_type())
            for n, sl in zip(self.column_names, self.select_list)
        ]

    def get_computed_column_index(self, name: str, allow_add: bool = False) -> int:
        for i, n in enumerate(self.column_names):
            if n == name:
                return i
        return NOT_FOUND

    def get_column_type(self, idx):
        return self.select_list[idx].expr.return_type()


class GroupByNode(TableExpressionNode):
    """Hash aggregation (reference: sql/qtree/GroupByNode.cc)."""

    def __init__(
        self,
        select_list: List[SelectListEntry],
        group_exprs: List[ValueExpressionNode],
        table: TableExpressionNode,
    ):
        self.select_list = select_list
        self.group_exprs = group_exprs
        self.table = table
        self.output_columns = [sl.column_name() for sl in select_list]
        self.is_partial = False

    def get_result_columns(self):
        return list(self.output_columns)

    def get_available_columns(self):
        return [
            QualifiedColumn(n, n, sl.expr.return_type())
            for n, sl in zip(self.output_columns, self.select_list)
        ]

    def get_computed_column_index(self, name: str, allow_add: bool = False) -> int:
        for i, sl in enumerate(self.select_list):
            if sl.column_name() == name:
                return i
        if not allow_add:
            return NOT_FOUND
        child_idx = self.table.get_computed_column_index(name, allow_add)
        if child_idx != NOT_FOUND:
            entry = SelectListEntry(
                ColumnReferenceNode(None, self.table.get_column_type(child_idx), child_idx),
                alias=name,
            )
            self.select_list.append(entry)
            return len(self.select_list) - 1
        return NOT_FOUND

    def get_column_type(self, idx):
        return self.select_list[idx].expr.return_type()


class JoinNode(TableExpressionNode):
    """Join of two tables (reference: sql/qtree/JoinNode.cc). The join's
    expressions reference a per-row concatenated input vector described
    by input_map: (table_idx, column_idx) pairs."""

    INNER = "INNER"
    LEFT = "LEFT"
    RIGHT = "RIGHT"
    CARTESIAN = "CARTESIAN"

    @dataclass
    class InputColumnRef:
        column: str
        table_idx: int  # 0 = base, 1 = joined
        column_idx: int
        stype: SType

    def __init__(self, join_type: str, base_table, joined_table):
        self.join_type = join_type
        self.base_table = base_table
        self.joined_table = joined_table
        self.select_list: List[SelectListEntry] = []
        self.column_names: List[str] = []
        self.input_map: List[JoinNode.InputColumnRef] = []
        self.where_expr: Optional[ValueExpressionNode] = None
        self.join_cond: Optional[ValueExpressionNode] = None

    def add_select_list(self, entry: SelectListEntry):
        self.column_names.append(entry.column_name())
        self.select_list.append(entry)

    def get_result_columns(self):
        return list(self.column_names)

    def get_available_columns(self):
        return (
            self.base_table.get_available_columns()
            + self.joined_table.get_available_columns()
        )

    def get_input_column_index(self, column_name: str, allow_add: bool = False) -> int:
        for i, ref in enumerate(self.input_map):
            if ref.column == column_name:
                return i
        base_idx = self.base_table.get_computed_column_index(column_name, allow_add)
        joined_idx = self.joined_table.get_computed_column_index(column_name, allow_add)
        if base_idx != NOT_FOUND and joined_idx != NOT_FOUND:
            raise RuntimeError_(f"ambiguous column reference: '{column_name}'")
        if base_idx != NOT_FOUND:
            self.input_map.append(
                JoinNode.InputColumnRef(
                    column_name, 0, base_idx, self.base_table.get_column_type(base_idx)
                )
            )
            return len(self.input_map) - 1
        if joined_idx != NOT_FOUND:
            self.input_map.append(
                JoinNode.InputColumnRef(
                    column_name,
                    1,
                    joined_idx,
                    self.joined_table.get_column_type(joined_idx),
                )
            )
            return len(self.input_map) - 1
        return NOT_FOUND

    def get_input_column_type(self, idx: int) -> SType:
        if idx >= len(self.input_map):
            raise RuntimeError_(f"invalid column index: '{idx}'")
        return self.input_map[idx].stype

    def get_input_column_info(self, column_name: str, allow_add: bool = False):
        idx = self.get_input_column_index(column_name, allow_add)
        if idx == NOT_FOUND:
            return (NOT_FOUND, SType.NIL)
        return (idx, self.get_input_column_type(idx))

    def get_computed_column_index(self, column_name: str, allow_add: bool = False) -> int:
        for i, n in enumerate(self.column_names):
            if n == column_name:
                return i
        input_idx = self.get_input_column_index(column_name, allow_add)
        if input_idx != NOT_FOUND:
            entry = SelectListEntry(
                ColumnReferenceNode(None, self.get_input_column_type(input_idx), input_idx),
                alias=column_name,
            )
            self.select_list.append(entry)
            return len(self.select_list) - 1
        return NOT_FOUND

    def get_column_type(self, idx):
        return self.select_list[idx].expr.return_type()


class SubqueryNode(TableExpressionNode):
    """FROM (SELECT ...) (reference: sql/qtree/SubqueryNode.cc)."""

    def __init__(
        self,
        subquery: TableExpressionNode,
        select_list: List[SelectListEntry],
        where_expr: Optional[ValueExpressionNode],
    ):
        self.subquery = subquery
        self.select_list = select_list
        self.where_expr = where_expr
        self.column_names = [sl.column_name() for sl in select_list]
        self.alias = ""

    def get_result_columns(self):
        return list(self.column_names)

    def get_available_columns(self):
        qualifier = self.alias + "." if self.alias else ""
        cols = []
        for c in self.subquery.get_result_columns():
            idx = self.subquery.get_computed_column_index(c)
            cols.append(QualifiedColumn(qualifier + c, c, self.subquery.get_column_type(idx)))
        return cols

    def get_computed_column_index(self, column_name: str, allow_add: bool = False) -> int:
        col = column_name
        if self.alias and col.startswith(self.alias + "."):
            col = col[len(self.alias) + 1 :]
        for i, n in enumerate(self.column_names):
            if n == col or n == column_name:
                return i
        child_idx = self.subquery.get_computed_column_index(col, False)
        if child_idx != NOT_FOUND:
            entry = SelectListEntry(
                ColumnReferenceNode(None, self.subquery.get_column_type(child_idx), child_idx),
                alias=col,
            )
            self.select_list.append(entry)
            self.column_names.append(col)
            return len(self.select_list) - 1
        return NOT_FOUND

    def get_column_type(self, idx):
        return self.select_list[idx].expr.return_type()


@dataclass
class SortSpec:
    expr: ValueExpressionNode
    descending: bool


class OrderByNode(TableExpressionNode):
    def __init__(self, sort_specs: List[SortSpec], table: TableExpressionNode):
        self.sort_specs = sort_specs
        self.table = table

    def get_result_columns(self):
        return self.table.get_result_columns()

    def get_available_columns(self):
        return self.table.get_available_columns()

    def get_computed_column_index(self, name, allow_add=False):
        return self.table.get_computed_column_index(name, allow_add)

    def get_column_type(self, idx):
        return self.table.get_column_type(idx)


class LimitNode(TableExpressionNode):
    def __init__(self, limit: int, offset: int, table: TableExpressionNode):
        self.limit = limit
        self.offset = offset
        self.table = table

    def get_result_columns(self):
        return self.table.get_result_columns()

    def get_available_columns(self):
        return self.table.get_available_columns()

    def get_computed_column_index(self, name, allow_add=False):
        return self.table.get_computed_column_index(name, allow_add)

    def get_column_type(self, idx):
        return self.table.get_column_type(idx)


class ShowTablesNode(TableExpressionNode):
    def get_result_columns(self):
        return ["table_name", "description"]

    def get_computed_column_index(self, name, allow_add=False):
        try:
            return self.get_result_columns().index(name)
        except ValueError:
            return NOT_FOUND

    def get_column_type(self, idx):
        return SType.STRING

    def get_available_columns(self):
        return [QualifiedColumn(n, n, SType.STRING) for n in self.get_result_columns()]


class DescribeTableNode(TableExpressionNode):
    def __init__(self, table_name: str):
        self.table_name = table_name

    def get_result_columns(self):
        return ["column_name", "type", "nullable", "description"]

    def get_computed_column_index(self, name, allow_add=False):
        try:
            return self.get_result_columns().index(name)
        except ValueError:
            return NOT_FOUND

    def get_column_type(self, idx):
        return SType.STRING

    def get_available_columns(self):
        return [QualifiedColumn(n, n, SType.STRING) for n in self.get_result_columns()]


class DescribePartitionsNode(TableExpressionNode):
    """DESCRIBE PARTITIONS <table>
    (reference: sql/statements/describe_partitions.cc:30-36)."""

    COLUMNS = [
        "partition_id",
        "servers",
        "keyrange_begin",
        "keyrange_end",
        "extra info",
    ]

    def __init__(self, table_name: str):
        self.table_name = table_name

    def get_result_columns(self):
        return list(self.COLUMNS)

    def get_computed_column_index(self, name, allow_add=False):
        try:
            return self.COLUMNS.index(name)
        except ValueError:
            return NOT_FOUND

    def get_column_type(self, idx):
        return SType.STRING

    def get_available_columns(self):
        return [QualifiedColumn(n, n, SType.STRING) for n in self.COLUMNS]


class ClusterShowServersNode(TableExpressionNode):
    """CLUSTER SHOW SERVERS
    (reference: sql/statements/cluster_show_servers.cc:30-39)."""

    COLUMNS = [
        "name",
        "status",
        "listenaddr",
        "buildinfo",
        "load",
        "disk_used",
        "disk_free",
        "partitions",
    ]

    def get_result_columns(self):
        return list(self.COLUMNS)

    def get_computed_column_index(self, name, allow_add=False):
        try:
            return self.COLUMNS.index(name)
        except ValueError:
            return NOT_FOUND

    def get_column_type(self, idx):
        return SType.STRING

    def get_available_columns(self):
        return [QualifiedColumn(n, n, SType.STRING) for n in self.COLUMNS]


class ChartNode(TableExpressionNode):
    """DRAW <charttype> ...; SELECT ...; — renders queries to SVG
    (reference: sql/extensions/chartsql/chart_expression.h)."""

    def __init__(self, chart_type: str, properties, union_queries: List[TableExpressionNode]):
        self.chart_type = chart_type
        self.properties = properties  # raw AST subtrees for axes etc.
        self.union_queries = union_queries

    def get_result_columns(self):
        return ["__chart"]

    def get_computed_column_index(self, name, allow_add=False):
        return 0 if name == "__chart" else NOT_FOUND

    def get_column_type(self, idx):
        return SType.STRING

    def get_available_columns(self):
        return [QualifiedColumn("__chart", "__chart", SType.STRING)]


class HavingNode(TableExpressionNode):
    """Post-aggregation filter (HAVING). The reference PARSES the
    clause (parser.cc havingClause) but no planner/executor consumes
    it — it silently ignores HAVING; this build implements the real
    semantics (a deliberate exceed-reference feature; silently
    dropping a filter loses rows the user asked to exclude). The
    expression is resolved against the child GroupBy's output columns
    at build time, so it contains no live aggregate calls. Group-key
    expressions not in the select list resolve through HIDDEN select
    entries the builder appends to the child's select_list (NOT its
    output_columns) — the final ResultList slice to get_result_columns
    strips them, exactly how ORDER BY's allow_add-appended sort
    columns are stripped on every other plan shape."""

    def __init__(self, table, filter_expr):
        self.table = table
        self.filter_expr = filter_expr

    def get_result_columns(self):
        return self.table.get_result_columns()

    def get_available_columns(self):
        return self.table.get_available_columns()

    def get_computed_column_index(self, name, allow_add=False):
        return self.table.get_computed_column_index(name, allow_add)

    def get_column_type(self, idx):
        return self.table.get_column_type(idx)

    @property
    def select_list(self):
        # ORDER BY resolution reaches through to the aggregation's
        # select entries (builder._build_order_by aggregate matching)
        return self.table.select_list


class ExplainNode(QueryTreeNode):
    """EXPLAIN <select>: renders the built logical plan. The reference
    parses EXPLAIN (parser.cc:914 T_EXPLAIN_QUERY) but has no planner
    or executor for it; this build renders the real plan tree — a
    deliberate exceed-reference feature."""

    def __init__(self, child):
        self.child = child

    def get_result_columns(self):
        return ["QUERY PLAN"]


def explain_lines(node, depth: int = 0):
    """Indented one-line-per-operator rendering of a logical plan."""
    pad = "  " * depth
    out = []

    def exprs(es):
        return ", ".join(e.to_sql() for e in es)

    if isinstance(node, SequentialScanNode):
        line = f"{pad}SequentialScan on {node.table_name}"
        if node.select_list:
            line += f" [{exprs(sl.expr for sl in node.select_list)}]"
        if node.where_expr is not None:
            line += f" where {node.where_expr.to_sql()}"
        if node.keyrange is not None:
            line += f" keyrange {node.keyrange}"
        out.append(line)
        return out
    if isinstance(node, GroupByNode):
        kind = "PartialGroupBy" if node.is_partial else "GroupBy"
        line = f"{pad}{kind}"
        if node.group_exprs:
            line += f" keys [{exprs(node.group_exprs)}]"
        line += f" select [{exprs(sl.expr for sl in node.select_list)}]"
        out.append(line)
        out.extend(explain_lines(node.table, depth + 1))
        return out
    if isinstance(node, OrderByNode):
        specs = ", ".join(
            sp.expr.to_sql() + (" DESC" if sp.descending else "")
            for sp in node.sort_specs
        )
        out.append(f"{pad}OrderBy [{specs}]")
        out.extend(explain_lines(node.table, depth + 1))
        return out
    if isinstance(node, LimitNode):
        out.append(f"{pad}Limit {node.limit} offset {node.offset}")
        out.extend(explain_lines(node.table, depth + 1))
        return out
    if isinstance(node, JoinNode):
        line = f"{pad}Join {node.join_type}"
        if node.join_cond is not None:
            line += f" on {node.join_cond.to_sql()}"
        if node.where_expr is not None:
            line += f" where {node.where_expr.to_sql()}"
        out.append(line)
        out.extend(explain_lines(node.base_table, depth + 1))
        out.extend(explain_lines(node.joined_table, depth + 1))
        return out
    if isinstance(node, SubqueryNode):
        line = f"{pad}Subquery"
        if node.where_expr is not None:
            line += f" where {node.where_expr.to_sql()}"
        out.append(line)
        out.extend(explain_lines(node.subquery, depth + 1))
        return out
    if isinstance(node, SelectExpressionNode):
        out.append(
            f"{pad}Select [{exprs(sl.expr for sl in node.select_list)}]"
        )
        return out
    out.append(f"{pad}{type(node).__name__}")
    child = getattr(node, "table", None)
    if child is not None and isinstance(child, QueryTreeNode):
        out.extend(explain_lines(child, depth + 1))
    return out


# ---------------------------------------------------------------------------
# DDL / DML statements (reference: sql/qtree/nodes/*)
# ---------------------------------------------------------------------------


@dataclass
class ColumnDefinition:
    column_name: str
    column_type: str  # type name as written ("uint64", "string", ...)
    repeated: bool = False
    not_null: bool = False
    subcolumns: Optional[List["ColumnDefinition"]] = None  # RECORD type


class DDLNode(QueryTreeNode):
    """DDL statements produce empty results
    (reference: scheduler.cc:395-412 returns an empty ResultCursor)."""

    def get_result_columns(self):
        return []


class CreateTableNode(DDLNode):
    def __init__(self, table_name, columns, primary_key, partition_key, properties):
        self.table_name = table_name
        self.columns: List[ColumnDefinition] = columns
        self.primary_key: List[str] = primary_key
        self.partition_key: Optional[str] = partition_key
        self.properties: List[Tuple[str, str]] = properties


class DropTableNode(DDLNode):
    def __init__(self, table_name):
        self.table_name = table_name


class CreateDatabaseNode(DDLNode):
    def __init__(self, database_name):
        self.database_name = database_name


class UseDatabaseNode(DDLNode):
    def __init__(self, database_name):
        self.database_name = database_name


class AlterTableNode(DDLNode):
    ADD_COLUMN = "ADD_COLUMN"
    DROP_COLUMN = "DROP_COLUMN"
    SET_PROPERTY = "SET_PROPERTY"

    def __init__(self, table_name, operations):
        self.table_name = table_name
        # operations: list of (kind, payload) where payload is a
        # ColumnDefinition, a column name, or a (key, value) pair
        self.operations = operations


class InsertIntoNode(DDLNode):
    def __init__(self, table_name, columns, value_exprs, json_data=None):
        self.table_name = table_name
        self.columns: List[str] = columns
        self.value_exprs: List[ValueExpressionNode] = value_exprs
        self.json_data: Optional[str] = json_data
