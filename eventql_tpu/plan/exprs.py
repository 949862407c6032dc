"""Typed value-expression nodes (the logical expression tree).

Mirrors the reference's qtree expression nodes
(reference: sql/qtree/{LiteralExpressionNode,ColumnReferenceNode,
CallExpressionNode,IfExpressionNode,RegexExpressionNode}.cc) including
their toSQL() renderings, which feed derived column names.
"""

from __future__ import annotations

from typing import List, Optional

from eventql_tpu.core.errors import RuntimeError_
from eventql_tpu.core.types import SType, SValue, sql_typename


class ValueExpressionNode:
    def return_type(self) -> SType:
        raise NotImplementedError

    def arguments(self) -> List["ValueExpressionNode"]:
        return []

    def to_sql(self) -> str:
        raise NotImplementedError


class LiteralExpressionNode(ValueExpressionNode):
    def __init__(self, value: SValue):
        self.value = value

    def return_type(self) -> SType:
        return self.value.stype

    def to_sql(self) -> str:
        # reference: LiteralExpressionNode::toSQL → sql_toexprstring
        return self.value.to_expr_string()

    def __repr__(self):
        return f"Literal({self.value})"


class ColumnReferenceNode(ValueExpressionNode):
    def __init__(self, column_name: Optional[str], stype: SType, index: Optional[int] = None):
        self.column_name = column_name
        self.stype = stype
        self.column_index = index

    def return_type(self) -> SType:
        return self.stype

    def to_sql(self) -> str:
        # reference: ColumnReferenceNode::toSQL (ColumnReferenceNode.cc:93-99)
        if not self.column_name:
            return f"subquery_column({self.column_index})"
        return f"`{self.column_name}`"

    def __repr__(self):
        return f"ColumnRef({self.column_name!r}@{self.column_index}:{sql_typename(self.stype)})"


class CallExpressionNode(ValueExpressionNode):
    def __init__(self, function_name, sfunction, args, within_record=False):
        self.function_name = function_name
        self.sfunction = sfunction  # resolved SFunction
        self.args = args
        self.within_record = within_record

    def return_type(self) -> SType:
        return self.sfunction.return_type

    def arguments(self):
        return self.args

    def is_aggregate(self) -> bool:
        from eventql_tpu.plan.functions import FN_AGGREGATE

        return self.sfunction.kind == FN_AGGREGATE

    def is_pure(self) -> bool:
        from eventql_tpu.plan.functions import FN_PURE

        return self.sfunction.kind == FN_PURE and not self.sfunction.has_side_effects

    def to_sql(self) -> str:
        # reference: CallExpressionNode::toSQL (CallExpressionNode.cc:151-161)
        return f"{self.function_name}({','.join(a.to_sql() for a in self.args)})"

    def __repr__(self):
        return f"Call({self.function_name}, {self.args})"


class IfExpressionNode(ValueExpressionNode):
    """if(cond, then, else). Both branches must have the same type after
    implicit conversion (reference: IfExpressionNode::newNode)."""

    def __init__(self, cond, true_branch, false_branch, rtype: SType):
        self.cond = cond
        self.true_branch = true_branch
        self.false_branch = false_branch
        self.rtype = rtype

    def return_type(self) -> SType:
        return self.rtype

    def arguments(self):
        return [self.cond, self.true_branch, self.false_branch]

    def to_sql(self) -> str:
        return "if(%s, %s, %s)" % (
            self.cond.to_sql(),
            self.true_branch.to_sql(),
            self.false_branch.to_sql(),
        )


class RegexExpressionNode(ValueExpressionNode):
    def __init__(self, subject, pattern: str):
        self.subject = subject
        self.pattern = pattern

    def return_type(self) -> SType:
        return SType.BOOL

    def arguments(self):
        return [self.subject]

    def to_sql(self) -> str:
        return f"({self.subject.to_sql()} REGEX '{self.pattern}')"


class LikeExpressionNode(ValueExpressionNode):
    def __init__(self, subject, pattern: str):
        self.subject = subject
        self.pattern = pattern

    def return_type(self) -> SType:
        return SType.BOOL

    def arguments(self):
        return [self.subject]

    def to_sql(self) -> str:
        return f"({self.subject.to_sql()} LIKE '{self.pattern}')"


class IsNullExpressionNode(ValueExpressionNode):
    """isnull(expr) — needs its argument's null *tag*, which ordinary
    function calls strip, so it is a dedicated node."""

    def __init__(self, arg):
        self.arg = arg

    def return_type(self) -> SType:
        return SType.BOOL

    def arguments(self):
        return [self.arg]

    def to_sql(self) -> str:
        return f"isnull({self.arg.to_sql()})"


def has_aggregate_call(expr: ValueExpressionNode) -> bool:
    if isinstance(expr, CallExpressionNode) and expr.is_aggregate():
        return True
    return any(has_aggregate_call(a) for a in expr.arguments())


def is_constant(expr: ValueExpressionNode) -> bool:
    # reference: QueryTreeUtil::isConstantExpression (QueryTreeUtil.cc:59-80)
    if isinstance(expr, ColumnReferenceNode):
        return False
    if isinstance(expr, CallExpressionNode) and not expr.is_pure():
        return False
    return all(is_constant(a) for a in expr.arguments())
