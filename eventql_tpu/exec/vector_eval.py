"""Vectorized (columnar) expression evaluation.

The reference interprets expressions row-at-a-time on a stack VM
(reference: sql/runtime/vm.cc:107-157, vectorized variants
vm.cc:178-272). Here every expression evaluates as a whole-column
operation: numeric ops run as numpy/XLA array ops with C wraparound
semantics, string ops run over dictionaries where possible, and any
function without a dedicated vector kernel falls back to applying the
exact host scalar implementation element-wise — so vectorization never
changes semantics.

Null-tag rules (reference: sql/svalue.cc:928-958, SURVEY.md App. A):
* any function call produces non-null output and reads null inputs as
  their zeroed payloads
* only direct column references / literals propagate nullness
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from eventql_tpu.core.errors import RuntimeError_
from eventql_tpu.core.types import SType, SValue
from eventql_tpu.exec.relation import Column, dtype_for
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

U = SType.UINT64
I = SType.INT64
F = SType.FLOAT64
B = SType.BOOL
S = SType.STRING
T = SType.TIMESTAMP64
N = SType.NIL


def _zero_invalid(col: Column) -> Column:
    """Enforce the zeroed-null-payload invariant
    (reference: sql/CSTableScan.cc:884-890)."""
    if col.valid.all():
        return col
    data = col.data.copy()
    if col.stype == S:
        data[~col.valid] = 0
    else:
        data[~col.valid] = 0
    return Column(col.stype, data, col.valid, col.dictionary)


class EvalContext:
    """Evaluation context: the input columns (by index) and the active
    row mask (rows that passed upstream filters — used only to scope
    data-dependent runtime errors like 'modulo by zero')."""

    def __init__(self, columns: List[Column], num_rows: int, mask: Optional[np.ndarray] = None):
        self.columns = columns
        self.num_rows = num_rows
        self.mask = mask


def evaluate_vector(expr: ValueExpressionNode, ctx: EvalContext) -> Column:
    if isinstance(expr, LiteralExpressionNode):
        return Column.from_scalar(expr.value, ctx.num_rows)

    if isinstance(expr, ColumnReferenceNode):
        if expr.column_index is None:
            raise RuntimeError_(
                f"unresolved column reference: {expr.column_name}"
            )
        return ctx.columns[expr.column_index]

    if isinstance(expr, IsNullExpressionNode):
        arg = evaluate_vector(expr.arg, ctx)
        data = ~arg.valid if arg.stype != N else np.ones(ctx.num_rows, bool)
        return Column(B, data, np.ones(ctx.num_rows, bool))

    if isinstance(expr, IfExpressionNode):
        cond = evaluate_vector(expr.cond, ctx)
        tv = evaluate_vector(expr.true_branch, ctx)
        fv = evaluate_vector(expr.false_branch, ctx)
        return _merge_where(cond.data.astype(bool), tv, fv)

    if isinstance(expr, RegexExpressionNode):
        subj = evaluate_vector(expr.subject, ctx)
        return _regex_match(subj, expr.pattern, ctx)

    if isinstance(expr, LikeExpressionNode):
        raise RuntimeError_("LIKE is not yet implemented, use REGEX instead")

    if isinstance(expr, CallExpressionNode):
        fn = expr.sfunction
        args = [evaluate_vector(a, ctx) for a in expr.args]
        kernel = _KERNELS.get((fn.name,) + tuple(fn.arg_types))
        if kernel is not None:
            out = kernel(ctx, *args)
        else:
            out = _fallback_apply(fn, args, ctx)
        return out

    raise RuntimeError_(f"can't evaluate expression: {expr!r}")


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _new_col(stype: SType, data: np.ndarray, dictionary=None) -> Column:
    # function-call results are never null (tags cleared on push)
    return Column(stype, data, np.ones(len(data), dtype=bool), dictionary)


def _merge_where(cond: np.ndarray, tv: Column, fv: Column) -> Column:
    assert tv.stype == fv.stype
    if tv.stype == S:
        t_strs = tv.materialize_strings()
        f_strs = fv.materialize_strings()
        out = np.where(cond, t_strs, f_strs)
        valid = np.where(cond, tv.valid, fv.valid)
        col = Column.from_strings([bytes(x) for x in out])
        col.valid = valid
        return _zero_invalid(col)
    data = np.where(cond, tv.data, fv.data).astype(tv.data.dtype)
    valid = np.where(cond, tv.valid, fv.valid)
    return _zero_invalid(Column(tv.stype, data, valid, None))


def _regex_match(subj: Column, pattern: str, ctx: EvalContext) -> Column:
    import re

    try:
        pat = re.compile(pattern.encode())
    except re.error as e:
        raise RuntimeError_(f"invalid regex: {e}")
    if subj.stype == S:
        # match once per dictionary entry, then gather
        dict_hits = np.array(
            [pat.search(bytes(d)) is not None for d in subj.dictionary], dtype=bool
        )
        null_hit = pat.search(b"") is not None
        data = np.where(subj.valid, dict_hits[subj.data], null_hit)
        return _new_col(B, data)
    strs = _payload_strings(subj)
    data = np.array([pat.search(s) is not None for s in strs], dtype=bool)
    return _new_col(B, data)


def _payload_strings(col: Column) -> np.ndarray:
    """Object array of byte-string payloads for any column type."""
    if col.stype == S:
        return col.materialize_strings()
    out = np.empty(len(col.data), dtype=object)
    for i in range(len(col.data)):
        out[i] = col.value_at(i).payload()
    return out


def _payloads(col: Column):
    """Payload array with zeroed nulls (for numeric types the data array
    itself, thanks to the zeroed-null invariant)."""
    if col.stype == S:
        return col.materialize_strings()
    return col.data


def _fallback_apply(fn, args: List[Column], ctx: EvalContext) -> Column:
    """Element-wise application of the exact host scalar implementation."""
    if fn.scalar_fn is None:
        raise RuntimeError_(f"no implementation for {fn.name}")

    n = ctx.num_rows

    # dictionary fast path: single string arg, other args constant
    # (a constant column is one whose data is all-equal literal); we key
    # on: first arg STRING, remaining args all length-1 dictionaries or
    # numerically constant — conservatively skipped; plain row loop:
    payloads = [_payloads(a) for a in args]

    # zero payloads for nulls in string columns (materialize_strings
    # already does), numeric handled by invariant
    results = [None] * n
    active = ctx.mask if ctx.mask is not None else np.ones(n, dtype=bool)
    rtype = fn.return_type
    out_dtype = dtype_for(rtype)

    if rtype == S:
        for i in range(n):
            if active[i]:
                results[i] = fn.scalar_fn(*(p[i] for p in payloads))
            else:
                results[i] = b""
        col = Column.from_strings(results)
        return col
    data = np.zeros(n, dtype=out_dtype)
    for i in range(n):
        if active[i]:
            v = fn.scalar_fn(*(p[i] for p in payloads))
            if rtype in (U, T):
                v = int(v) & 0xFFFFFFFFFFFFFFFF
            data[i] = v
    if rtype == N:
        return Column(N, np.zeros(n, np.uint8), np.zeros(n, bool))
    return _new_col(rtype, data)


# ---------------------------------------------------------------------------
# vector kernels for the hot functions
# ---------------------------------------------------------------------------

_KERNELS: Dict[Tuple, Callable] = {}


def _kernel(name, *arg_types):
    def deco(f):
        _KERNELS[(name,) + tuple(arg_types)] = f
        return f

    return deco


def _active(ctx):
    return ctx.mask if ctx.mask is not None else None


# ---- arithmetic -----------------------------------------------------------

for _t, _np in ((U, np.uint64), (I, np.int64), (F, np.float64)):

    def _mk_arith(npdtype, t):
        def add_k(ctx, a, b):
            return _new_col(t, (a.data + b.data).astype(npdtype))

        def sub_k(ctx, a, b):
            return _new_col(t, (a.data - b.data).astype(npdtype))

        def mul_k(ctx, a, b):
            return _new_col(t, (a.data * b.data).astype(npdtype))

        return add_k, sub_k, mul_k

    _a, _s, _m = _mk_arith(_np, _t)
    _KERNELS[("add", _t, _t)] = _a
    _KERNELS[("sub", _t, _t)] = _s
    _KERNELS[("mul", _t, _t)] = _m


@_kernel("div", F, F)
def _div_f(ctx, a, b):
    with np.errstate(divide="ignore", invalid="ignore"):
        return _new_col(F, a.data / b.data)


def _check_zero_divisor(ctx, b, what):
    active = _active(ctx)
    zeros = b.data == 0
    if active is not None:
        zeros = zeros & active
    if zeros.any():
        raise RuntimeError_(f"{what} by zero")


@_kernel("mod", U, U)
def _mod_u(ctx, a, b):
    _check_zero_divisor(ctx, b, "modulo")
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(b.data != 0, np.mod(a.data, np.where(b.data == 0, 1, b.data)), 0)
    return _new_col(U, out.astype(np.uint64))


@_kernel("mod", I, I)
def _mod_i(ctx, a, b):
    _check_zero_divisor(ctx, b, "modulo")
    bb = np.where(b.data == 0, 1, b.data)
    out = np.fmod(a.data, bb)  # C-style: sign of dividend
    return _new_col(I, out.astype(np.int64))


@_kernel("mod", F, F)
def _mod_f(ctx, a, b):
    with np.errstate(divide="ignore", invalid="ignore"):
        return _new_col(F, np.fmod(a.data, b.data))


@_kernel("pow", F, F)
def _pow_f(ctx, a, b):
    return _new_col(F, np.power(a.data, b.data))


# ---- comparisons ----------------------------------------------------------


def _string_ids_unified(a: Column, b: Column):
    """Map two string columns into one shared dictionary; returns
    (ids_a, ids_b, dictionary_sorted). The dictionary is sorted so ids
    compare like the underlying bytes."""
    combined = np.concatenate([a.dictionary, b.dictionary])
    uniq, inverse = np.unique(combined.astype(bytes), return_inverse=True)
    map_a = inverse[: len(a.dictionary)]
    map_b = inverse[len(a.dictionary) :]
    ids_a = map_a[a.data]
    ids_b = map_b[b.data]
    # null payload is b"" — replace ids of invalid rows with the id b""
    # would have; searchsorted on the sorted unique array:
    empty_id = np.searchsorted(uniq, b"")
    has_empty = empty_id < len(uniq) and uniq[empty_id] == b""
    if not (a.valid.all() and b.valid.all()):
        if not has_empty:
            # insert b"" at front (it sorts first)
            uniq = np.concatenate([np.array([b""], dtype=object), uniq])
            ids_a = ids_a + 1
            ids_b = ids_b + 1
            empty_id = 0
        ids_a = np.where(a.valid, ids_a, empty_id)
        ids_b = np.where(b.valid, ids_b, empty_id)
    return ids_a, ids_b


def _mk_cmp(op):
    def k_num(ctx, a, b):
        return _new_col(B, op(a.data, b.data))

    def k_str(ctx, a, b):
        ids_a, ids_b = _string_ids_unified(a, b)
        return _new_col(B, op(ids_a, ids_b))

    return k_num, k_str


for _name, _op in (
    ("eq", np.equal),
    ("neq", np.not_equal),
    ("lt", np.less),
    ("lte", np.less_equal),
    ("gt", np.greater),
    ("gte", np.greater_equal),
):
    knum, kstr = _mk_cmp(_op)
    for _t in (U, I, F, B, T):
        if _name in ("eq", "neq") or _t != B:
            _KERNELS[(_name, _t, _t)] = knum
    _KERNELS[(_name, S, S)] = kstr


def _mk_cmp3(t):
    def k(ctx, a, b):
        out = np.where(a.data < b.data, -1, np.where(a.data > b.data, 1, 0))
        return _new_col(I, out.astype(np.int64))

    return k


for _t in (U, I, F, T):
    _KERNELS[("cmp", _t, _t)] = _mk_cmp3(_t)


@_kernel("cmp", S, S)
def _cmp_str(ctx, a, b):
    ids_a, ids_b = _string_ids_unified(a, b)
    out = np.where(ids_a < ids_b, -1, np.where(ids_a > ids_b, 1, 0))
    return _new_col(I, out.astype(np.int64))


# ---- logic ----------------------------------------------------------------


@_kernel("logical_and", B, B)
def _and_k(ctx, a, b):
    return _new_col(B, a.data & b.data)


@_kernel("logical_or", B, B)
def _or_k(ctx, a, b):
    return _new_col(B, a.data | b.data)


@_kernel("neg", B)
def _neg_k(ctx, a):
    return _new_col(B, ~a.data)


# ---- conversions ----------------------------------------------------------


@_kernel("to_nil", U)
@_kernel("to_nil", I)
@_kernel("to_nil", F)
@_kernel("to_nil", B)
@_kernel("to_nil", S)
@_kernel("to_nil", T)
def _to_nil_k(ctx, a):
    n = len(a.data)
    return Column(N, np.zeros(n, np.uint8), np.zeros(n, bool))


def _mk_cast(dst, npdtype):
    def k(ctx, a):
        return _new_col(dst, a.data.astype(npdtype))

    return k


for _src in (U, I, B, T):
    _KERNELS[("to_float64", _src)] = _mk_cast(F, np.float64)
    _KERNELS[("to_float", _src)] = _mk_cast(F, np.float64)
for _src in (U, B, T):
    _KERNELS[("to_int64", _src)] = _mk_cast(I, np.int64)
    _KERNELS[("to_int", _src)] = _mk_cast(I, np.int64)
_KERNELS[("to_int64", F)] = _mk_cast(I, np.int64)
_KERNELS[("to_int", F)] = _mk_cast(I, np.int64)
for _src in (I, F, U):
    _KERNELS[("to_timestamp64", _src)] = _mk_cast(T, np.uint64)
_KERNELS[("to_uint64", T)] = _mk_cast(U, np.uint64)
_KERNELS[("to_uint64", I)] = _mk_cast(U, np.uint64)
_KERNELS[("to_uint64", F)] = _mk_cast(U, np.uint64)


@_kernel("truncate", F)
def _trunc_k(ctx, a):
    return _new_col(I, np.trunc(a.data).astype(np.int64))


# ---- datetime -------------------------------------------------------------


@_kernel("from_timestamp", I)
def _from_ts_i(ctx, a):
    return _new_col(T, (a.data * 1000000).astype(np.uint64))


@_kernel("from_timestamp", F)
def _from_ts_f(ctx, a):
    return _new_col(T, (a.data * 1000000.0).astype(np.uint64))


def _parse_time_window(w: bytes) -> int:
    """Parse a date_trunc window spec into its microsecond truncater
    (reference: date_trunc_timestamp64_call, datetime.cc:115-138)."""
    from eventql_tpu.plan import functions as pf

    wstr = w.decode("utf-8", errors="surrogateescape")
    try:
        mult, consumed = pf._parse_leading_int(wstr)
        if mult < 0:
            raise ValueError()
        name = wstr[consumed:]
    except ValueError:
        mult, name = 1, wstr
    if name not in pf.TIME_WINDOWS:
        raise RuntimeError_(f"unknown time window {wstr}")
    return pf.TIME_WINDOWS[name] * mult


@_kernel("date_trunc", S, T)
def _date_trunc_k(ctx, window, ts):
    # vectorized when the window is a single constant (the common case)
    if window.dictionary is not None and len(window.dictionary) == 1:
        t = _parse_time_window(bytes(window.dictionary[0]))
        return _new_col(T, (ts.data // np.uint64(t)) * np.uint64(t))
    strs = window.materialize_strings()
    out = np.empty(len(ts.data), dtype=np.uint64)
    for i in range(len(ts.data)):
        t = _parse_time_window(bytes(strs[i]))
        out[i] = (int(ts.data[i]) // t) * t
    return _new_col(T, out)


# ---- strings --------------------------------------------------------------


def _dict_transform(name):
    """Unary string->string fns apply once per dictionary entry."""

    def deco(scalar):
        def k(ctx, a):
            new_dict = np.array(
                [scalar(bytes(d)) for d in a.dictionary], dtype=object
            )
            if a.valid.all():
                return _new_col(S, a.data.copy(), new_dict)
            # null payloads are b""
            null_result = scalar(b"")
            new_dict = np.concatenate([new_dict, np.array([null_result], object)])
            ids = np.where(a.valid, a.data, len(new_dict) - 1)
            return _new_col(S, ids.astype(np.int32), new_dict)

        _KERNELS[(name, S)] = k
        return scalar

    return deco


def _lcase_b(v: bytes) -> bytes:
    return bytes(c + 32 if 65 <= c <= 90 else c for c in v)


def _ucase_b(v: bytes) -> bytes:
    return bytes(c - 32 if 97 <= c <= 122 else c for c in v)


for _n in ("lcase", "lowercase"):
    _dict_transform(_n)(_lcase_b)
for _n in ("ucase", "uppercase"):
    _dict_transform(_n)(_ucase_b)
_dict_transform("ltrim")(lambda v: v.lstrip(b" "))
_dict_transform("rtrim")(lambda v: v.rstrip(b" "))


def _dict_predicate(name, arity2=True):
    """String fns with a (usually constant) second arg: vectorize over
    the dictionary when the second argument is a single-entry dict."""


@_kernel("fnv32", S)
def _fnv32_k(ctx, a):
    from eventql_tpu.plan.functions import _fnv32

    dict_vals = np.array([_fnv32(bytes(d).rstrip(b" ")) for d in a.dictionary], np.uint64)
    null_val = np.uint64(_fnv32(b""))
    out = np.where(a.valid, dict_vals[a.data], null_val)
    return _new_col(U, out.astype(np.uint64))


def _mk_str_pred(scalar):
    def k(ctx, a, b):
        if b.dictionary is not None and len(b.dictionary) == 1 and b.valid.all():
            arg = bytes(b.dictionary[0])
            dict_hits = np.array(
                [scalar(bytes(d), arg) for d in a.dictionary], dtype=bool
            )
            null_hit = scalar(b"", arg)
            out = np.where(a.valid, dict_hits[a.data], null_hit)
            return _new_col(B, out)
        sa = a.materialize_strings()
        sb = b.materialize_strings()
        return _new_col(
            B, np.array([scalar(x, y) for x, y in zip(sa, sb)], dtype=bool)
        )

    return k


_KERNELS[("startswith", S, S)] = _mk_str_pred(lambda s, p: s.startswith(p))
_KERNELS[("endswith", S, S)] = _mk_str_pred(lambda s, p: s.endswith(p))


@_kernel("concat", S, S)
@_kernel("add", S, S)
def _concat_k(ctx, a, b):
    sa = a.materialize_strings()
    sb = b.materialize_strings()
    return Column.from_strings([bytes(x) + bytes(y) for x, y in zip(sa, sb)])
