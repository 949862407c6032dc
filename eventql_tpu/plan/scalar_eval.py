"""Host-side scalar expression evaluation.

Used for constant folding at plan time and as the exact-semantics
reference path. Mirrors the reference VM's stack discipline in its
observable effects: function calls read argument *payloads* ignoring
null tags and produce non-null results; only plain copies preserve
nullness (reference: sql/runtime/vm.cc:107-157, sql/svalue.cc:928-958).
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional

from eventql_tpu.core.errors import RuntimeError_
from eventql_tpu.core.types import SType, SValue
from eventql_tpu.plan.exprs import (
    CallExpressionNode,
    ColumnReferenceNode,
    IfExpressionNode,
    IsNullExpressionNode,
    LikeExpressionNode,
    LiteralExpressionNode,
    RegexExpressionNode,
    ValueExpressionNode,
)


def evaluate_scalar(
    expr: ValueExpressionNode,
    input_row: Optional[List[SValue]] = None,
) -> SValue:
    """Evaluate an expression against an optional input row
    (index-resolved column references read input_row[idx])."""

    if isinstance(expr, LiteralExpressionNode):
        return expr.value

    if isinstance(expr, ColumnReferenceNode):
        if input_row is None or expr.column_index is None:
            raise RuntimeError_(
                f"can't evaluate column reference without input: "
                f"{expr.column_name}"
            )
        return input_row[expr.column_index]

    if isinstance(expr, IfExpressionNode):
        # lazy branch evaluation, like the VM's CJUMP
        cond = evaluate_scalar(expr.cond, input_row)
        branch = expr.true_branch if cond.payload() else expr.false_branch
        return evaluate_scalar(branch, input_row)

    if isinstance(expr, IsNullExpressionNode):
        v = evaluate_scalar(expr.arg, input_row)
        return SValue.new_bool(v.is_null or v.stype == SType.NIL)

    if isinstance(expr, RegexExpressionNode):
        v = evaluate_scalar(expr.subject, input_row)
        subject = v.payload()
        if not isinstance(subject, bytes):
            subject = str(subject).encode()
        try:
            pat = re.compile(expr.pattern.encode())
        except re.error as e:
            raise RuntimeError_(f"invalid regex: {e}")
        return SValue.new_bool(pat.search(subject) is not None)

    if isinstance(expr, LikeExpressionNode):
        # reference: LikePattern.cc:33-37
        raise RuntimeError_("LIKE is not yet implemented, use REGEX instead")

    if isinstance(expr, CallExpressionNode):
        fn = expr.sfunction
        if fn.kind != "pure":
            raise RuntimeError_(
                f"can't scalar-evaluate aggregate function {fn.name}"
            )
        args = [evaluate_scalar(a, input_row) for a in expr.args]
        payloads = [a.payload() for a in args]
        if fn.scalar_fn is None:
            raise RuntimeError_(f"no scalar implementation for {fn.name}")
        result = fn.scalar_fn(*payloads)
        return _box(fn.return_type, result)

    raise RuntimeError_(f"can't evaluate expression: {expr!r}")


def _box(stype: SType, value) -> SValue:
    if stype == SType.NIL:
        return SValue.new_null()
    if stype == SType.UINT64:
        return SValue.new_uint64(value)
    if stype == SType.INT64:
        return SValue.new_int64(value)
    if stype == SType.FLOAT64:
        return SValue.new_float64(value)
    if stype == SType.BOOL:
        return SValue.new_bool(value)
    if stype == SType.STRING:
        return SValue.new_string(value)
    if stype == SType.TIMESTAMP64:
        return SValue.new_timestamp64(value)
    raise RuntimeError_("invalid SType")
