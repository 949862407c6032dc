"""Query runtime: parse → plan → execute.

Mirrors the reference's Runtime/Transaction/QueryPlan composition
(reference: sql/runtime/runtime.cc:35-85, sql/query_plan.cc,
sql/transaction.h) in a single embeddable object, exactly like the
golden-file SQL test harness uses it (reference: test/sql_tests.cc).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from eventql_tpu.core.errors import RuntimeError_, SQLError
from eventql_tpu.core.types import SType, SValue
from eventql_tpu.exec.operators import execute_node
from eventql_tpu.exec.relation import Relation
from eventql_tpu.exec.result import ResultList
from eventql_tpu.plan import nodes as qn
from eventql_tpu.plan.builder import QueryPlanBuilder, TableProvider
from eventql_tpu.plan.functions import DEFAULT_REGISTRY
from eventql_tpu.plan.scalar_eval import evaluate_scalar
from eventql_tpu.sql.parser import Parser


class TableInfo:
    def __init__(self, table_name: str, columns):
        self.table_name = table_name
        self.columns = columns  # List[(name, SType)]


class RelationTableProvider(TableProvider):
    """Serves queries from in-memory Relations (what the CSV / cstable
    ingest layers produce)."""

    def __init__(self):
        self._tables: Dict[str, Relation] = {}

    def add_table(self, name: str, rel: Relation, stypes: Optional[List[SType]] = None):
        self._tables[name] = rel

    def describe(self, table_name: str) -> Optional[TableInfo]:
        rel = self._tables.get(table_name)
        if rel is None:
            return None
        cols = [(n, c.stype) for n, c in zip(rel.names, rel.columns)]
        return TableInfo(table_name, cols)

    def list_tables(self):
        return [self.describe(n) for n in sorted(self._tables)]

    def get_table_data(self, table_name: str) -> Relation:
        rel = self._tables.get(table_name)
        if rel is None:
            raise RuntimeError_(f"table not found: '{table_name}'")
        return rel


class Transaction:
    def __init__(self, tables: TableProvider, query_cache=None, trace=None):
        self.tables = tables
        self.query_cache = query_cache
        # per-operator timing (survey §5: the reference has no tracer —
        # this is the TPU build's addition): list of
        # (operator, depth, wall_seconds, output_rows) tuples, enabled
        # by passing trace=[] or EVENTQL_TRACE=1
        import os as _os

        if trace is None and _os.environ.get("EVENTQL_TRACE") == "1":
            trace = []
        self.trace = trace
        self._trace_depth = 0

    def get_table_data(self, table_name: str) -> Relation:
        return self.tables.get_table_data(table_name)

    def trace_report(self) -> str:
        if not self.trace:
            return ""
        out = []
        for op, depth, secs, rows in self.trace:
            out.append(f"{'  ' * depth}{op}: {secs * 1e3:.3f} ms, {rows} rows")
        return "\n".join(out)


class QueryPlan:
    def __init__(self, runtime: "Runtime", txn: Transaction, nodes: List[qn.QueryTreeNode]):
        self.runtime = runtime
        self.txn = txn
        self.nodes = nodes

    @property
    def num_queries(self) -> int:
        return len(self.nodes)

    def execute(self, idx: int) -> ResultList:
        node = self.nodes[idx]
        if isinstance(node, qn.ExplainNode):
            raise RuntimeError_("EXPLAIN is not implemented yet")
        rel = self._execute_traced(node)
        result_columns = node.get_result_columns()
        return ResultList.from_relation(result_columns, rel)

    def _execute_traced(self, node):
        # XLA/Pallas profiler hook (survey §5 — the reference has no
        # profiler): EVENTQL_XLA_TRACE=<dir> captures a per-query
        # device trace viewable in TensorBoard/Perfetto, alongside the
        # host-side per-operator tracer (Transaction.trace)
        import os as _os

        trace_dir = _os.environ.get("EVENTQL_XLA_TRACE")
        if trace_dir:
            import jax

            with jax.profiler.trace(trace_dir):
                return execute_node(node, self.txn)
        return execute_node(node, self.txn)


class Runtime:
    def __init__(self, registry=DEFAULT_REGISTRY):
        self.registry = registry

    def new_transaction(
        self, tables: Optional[TableProvider] = None, query_cache=None
    ) -> Transaction:
        return Transaction(tables or RelationTableProvider(), query_cache)

    def build_query_plan(self, txn: Transaction, query: str) -> QueryPlan:
        parser = Parser()
        statements = parser.parse(query)
        builder = QueryPlanBuilder(self.registry)
        nodes = builder.build_statements(statements, txn.tables)
        return QueryPlan(self, txn, nodes)

    def execute_query(self, txn: Transaction, query: str) -> List[ResultList]:
        plan = self.build_query_plan(txn, query)
        return [plan.execute(i) for i in range(plan.num_queries)]

    def evaluate_const_expression(self, txn: Transaction, expr_str: str) -> SValue:
        # reference: Runtime::evaluateConstExpression (runtime.cc:126-150)
        parser = Parser()
        ast = parser.parse_value_expression(expr_str)
        builder = QueryPlanBuilder(self.registry)
        from eventql_tpu.plan.builder import _empty_resolver

        expr = builder.build_value_expression(ast, _empty_resolver)
        return evaluate_scalar(expr)
