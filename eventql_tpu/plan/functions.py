"""Scalar & aggregate SQL function registry.

Re-implements the reference's function library surface
(reference: sql/defaults.cc:49-168, sql/expressions/*.cc) with exact
value semantics, as host-side scalar implementations used for constant
folding; the columnar device implementations live in
eventql_tpu.exec.vector_ops and are keyed by the same symbol names.

Where the reference's registered surface and its own test expectations
diverge (the codebase is mid-refactor), the test expectations win
(sql/runtime/Runtime_test.cc):
 * `/` is float division: `1 / 5` == 0.2 (Runtime_test.cc:501-509)
 * numeric uint64/int64 args promote to float64 when mixed with floats
   (Runtime_test.cc:511-568)
 * min/max/sum over (stringly) CSV columns coerce to float64
   (Runtime_test.cc:2314-2336)
 * to_int/to_float/to_string conversion fns (Runtime_test.cc:1809-1852)
 * truncate() (Runtime_test.cc:626-643), isnull() (Runtime_test.cc:1006)
"""

from __future__ import annotations

import math
import time as _time
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence, Tuple

from eventql_tpu.core.errors import RuntimeError_
from eventql_tpu.core.types import (
    SType,
    SValue,
    format_float,
    sql_typename,
    wrap_i64,
    wrap_u64,
)

FN_PURE = "pure"
FN_AGGREGATE = "aggregate"

# time constants (reference: util/time_constants.h)
kMicrosPerMilli = 1000
kMicrosPerSecond = 1000000
kMicrosPerMinute = kMicrosPerSecond * 60
kMicrosPerHour = kMicrosPerMinute * 60
kMicrosPerDay = kMicrosPerHour * 24
kMicrosPerWeek = kMicrosPerDay * 7
kMicrosPerYear = kMicrosPerDay * 365

# reference: sql/expressions/datetime.cc:58-80
TIME_WINDOWS = {
    "ms": kMicrosPerMilli,
    "msec": kMicrosPerMilli,
    "millisecond": kMicrosPerMilli,
    "milliseconds": kMicrosPerMilli,
    "s": kMicrosPerSecond,
    "sec": kMicrosPerSecond,
    "second": kMicrosPerSecond,
    "seconds": kMicrosPerSecond,
    "min": kMicrosPerMinute,
    "minute": kMicrosPerMinute,
    "minutes": kMicrosPerMinute,
    "h": kMicrosPerHour,
    "hour": kMicrosPerHour,
    "hours": kMicrosPerHour,
    "d": kMicrosPerDay,
    "day": kMicrosPerDay,
    "days": kMicrosPerDay,
    "w": kMicrosPerWeek,
    "week": kMicrosPerWeek,
    "weeks": kMicrosPerWeek,
    "month": kMicrosPerDay * 31,
    "months": kMicrosPerDay * 31,  # test-era constant (Runtime_test.cc:1070-1278 vectors fit 31d)
    "y": kMicrosPerYear,
    "year": kMicrosPerYear,
    "years": kMicrosPerYear,
}


@dataclass
class AggregateSpec:
    """Describes an aggregate as a (map, monoid-reduce, finalize) triple
    so the engine can run it as a vectorized segment reduction on device
    and merge partials across chips exactly like the reference's
    accumulate/merge/finalize vtable (reference: sql/runtime/vm.h:68-82).

    kind is one of: count, count_distinct, sum, min, max.
    """

    kind: str


@dataclass
class SFunction:
    name: str
    arg_types: Tuple[SType, ...]
    return_type: SType
    scalar_fn: Optional[Callable] = None  # host impl over payloads
    kind: str = FN_PURE
    allow_arg_conversion: bool = True
    has_side_effects: bool = False
    aggregate: Optional[AggregateSpec] = None

    @property
    def symbol(self) -> str:
        # reference: SymbolTableEntry ctor (symboltable.cc:33-42)
        return (
            self.name
            + "#"
            + sql_typename(self.return_type)
            + "/"
            + "".join(sql_typename(t) + ";" for t in self.arg_types)
        )


def _trunc_div(a: int, b: int) -> int:
    # C++ integer division truncates toward zero
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _trunc_mod(a: int, b: int) -> int:
    return a - b * _trunc_div(a, b)


def _parse_leading_float(s: str) -> float:
    """std::stof/stod-style parse of a leading float; raises on none."""
    import re

    m = re.match(r"\s*[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?", s)
    if not m or not m.group(0).strip():
        raise ValueError(f"can't parse: {s}")
    return float(m.group(0))


def _parse_leading_int(s: str) -> Tuple[int, int]:
    """std::stoull-style parse; returns (value, chars_consumed)."""
    import re

    m = re.match(r"\s*([+-]?\d+)", s)
    if not m:
        raise ValueError(f"can't parse: {s}")
    return int(m.group(1)), m.end()


# ---------------------------------------------------------------------------
# host scalar implementations.  Each takes raw payloads (never None for
# non-NIL types — null payloads are already zeroed by SValue.payload()).
# ---------------------------------------------------------------------------


def _date_trunc(window: bytes, ts: int) -> int:
    # reference: date_trunc_timestamp64_call (datetime.cc:115-138)
    w = window.decode("utf-8", errors="surrogateescape")
    try:
        mult, consumed = _parse_leading_int(w)
        if mult < 0:
            raise ValueError()
        name = w[consumed:]
    except ValueError:
        mult, name = 1, w
    if name not in TIME_WINDOWS:
        raise RuntimeError_(f"unknown time window {w}")
    truncater = TIME_WINDOWS[name] * mult
    return (ts // truncater) * truncater


_UNIT_PATTERNS = {
    # unit -> list of (multiplier, separator-regex) handled in _date_add
    "minute_second": ("m:s", [kMicrosPerMinute, kMicrosPerSecond]),
    "hour_second": ("h:m:s", [kMicrosPerHour, kMicrosPerMinute, kMicrosPerSecond]),
    "hour_minute": ("h:m", [kMicrosPerHour, kMicrosPerMinute]),
    "day_second": (
        "d h:m:s",
        [kMicrosPerDay, kMicrosPerHour, kMicrosPerMinute, kMicrosPerSecond],
    ),
    "day_minute": ("d h:m", [kMicrosPerDay, kMicrosPerHour, kMicrosPerMinute]),
    "day_hour": ("d h", [kMicrosPerDay, kMicrosPerHour]),
    "year_month": ("y-m", [kMicrosPerYear, kMicrosPerDay * 30]),  # golden 00011 fixes YEAR_MONTH months at 30d
}


def _is_number(s: str) -> bool:
    # reference: StringUtil::isNumber (stringutil.cc:325-350) — digits with
    # optional leading '-'; a single trailing '.'/',' group is tolerated.
    if not s:
        return False
    i = 1 if s[0] == "-" else 0
    if i >= len(s):
        return False
    return all(c.isdigit() for c in s[i:])


def _parse_unit_expr(unit: str, expr: str) -> List[int]:
    # reference: parseUnitExpr (datetime.cc:146-341)
    if unit in TIME_WINDOWS:
        try:
            interval = _parse_leading_float(expr)
        except ValueError:
            raise RuntimeError_(f"can't parse expr {expr}")
        return [int(interval * TIME_WINDOWS[unit])]

    if unit not in _UNIT_PATTERNS:
        raise RuntimeError_(f"can't parse unit {unit}")

    pattern, multipliers = _UNIT_PATTERNS[unit]

    def fail():
        kindmap = {
            "minute_second": "minutes:seconds",
            "hour_second": "hours:minutes:seconds",
            "hour_minute": "hours:minutes",
            "day_second": "days hours:minutes:seconds",
            "day_minute": "days hours:minutes",
            "day_hour": "days hours",
            "year_month": "years-months",
        }
        raise RuntimeError_(
            f"expected expr of type {kindmap[unit]}, got: {expr}"
        )

    if unit == "year_month":
        parts = expr.split("-")
    elif unit == "day_hour":
        parts = expr.split(" ")
    elif unit.startswith("day_"):
        day = expr.split(" ")
        if len(day) != 2 or not _is_number(day[0]):
            fail()
        parts = [day[0]] + day[1].split(":")
    else:
        parts = expr.split(":")

    if len(parts) != len(multipliers) or not all(_is_number(p) for p in parts):
        fail()
    try:
        return [int(p) * m for p, m in zip(parts, multipliers)]
    except ValueError:
        fail()


def _date_add(ts: int, expr: bytes, unit: bytes) -> int:
    # reference: date_add_timestamp64_call (datetime.cc:344-365)
    u = unit.decode("utf-8", errors="surrogateescape").lower()
    e = expr.decode("utf-8", errors="surrogateescape")
    return wrap_u64(ts + sum(_parse_unit_expr(u, e)))


def _time_at(spec: bytes) -> int:
    # reference: time_at (datetime.cc + util/human.cc) — accepts "now",
    # "-<interval> ago"/"-<interval>", unix timestamps, ISO dates.
    s = spec.decode("utf-8", errors="surrogateescape").strip().lower()
    now = int(_time.time() * kMicrosPerSecond)
    if s == "now":
        return now
    if s.startswith("-"):
        body = s[1:]
        if body.endswith(" ago"):
            body = body[:-4]
        try:
            num, consumed = _parse_leading_int(body)
            unit = body[consumed:].strip()
        except ValueError:
            raise RuntimeError_(f"TIME_AT: invalid argument {s}")
        if unit in TIME_WINDOWS:
            return now - num * TIME_WINDOWS[unit]
        raise RuntimeError_(f"TIME_AT: invalid argument {s}")
    if s.endswith(" ago"):
        body = s[:-4]
        try:
            num, consumed = _parse_leading_int(body)
            unit = body[consumed:].strip()
            if unit in TIME_WINDOWS:
                return now - num * TIME_WINDOWS[unit]
        except ValueError:
            pass
        raise RuntimeError_(f"TIME_AT: invalid argument {s}")
    if _is_number(s):
        v = int(s)
        # heuristic from util/human.cc: values are unix seconds unless
        # they are large enough to be millis/micros
        if v < 10000000000:
            return v * kMicrosPerSecond
        if v < 10000000000000:
            return v * kMicrosPerMilli
        return v
    # ISO date "YYYY-MM-DD [HH:MM[:SS]]"
    import calendar

    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M", "%Y-%m-%d"):
        try:
            tm = _time.strptime(s, fmt)
            return calendar.timegm(tm) * kMicrosPerSecond
        except ValueError:
            continue
    raise RuntimeError_(f"TIME_AT: invalid argument {spec!r}")


def _fnv32(data: bytes) -> int:
    # FNV-1a 32 bit (reference: util/fnv.h; input rtrimmed of spaces,
    # expressions/miscellaneous.cc fnv32_call)
    h = 2166136261
    for b in data:
        h ^= b
        h = (h * 16777619) & 0xFFFFFFFF
    return h


def _substring(s: bytes, cur: int, maxlen: Optional[int] = None) -> bytes:
    # reference: substring_call (expressions/string.cc:97-126) + 3-arg
    # variant semantics (commented reference impl, string.cc:129-165)
    strlen = len(s)
    if cur == 0 or strlen == 0:
        return b""
    if cur < 0:
        cur += strlen
        if cur < 0:
            return b""
    else:
        cur = min(cur - 1, strlen - 1)
    length = strlen - cur
    if maxlen is not None:
        length = min(maxlen, length)
    if length <= 0:
        return b""
    return s[cur : cur + length]


def _cmp(a, b) -> int:
    return -1 if a < b else (1 if a > b else 0)


def _float_to_string(v: float) -> bytes:
    return format_float(v).encode()


def _ts_format(micros: int) -> bytes:
    from eventql_tpu.core.types import format_timestamp

    return format_timestamp(micros).encode()


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

U = SType.UINT64
I = SType.INT64
F = SType.FLOAT64
B = SType.BOOL
S = SType.STRING
T = SType.TIMESTAMP64
N = SType.NIL


class FunctionRegistry:
    """Ordered function registry; order matters for overload resolution
    (reference: SymbolTable::resolve scans candidates in registration
    order, symboltable.cc:90-140)."""

    def __init__(self):
        self.functions = {}  # name -> list[SFunction]
        self.by_symbol = {}
        self.implicit_conversions = {}  # SType -> set[SType]

    def register(self, name: str, fn: SFunction):
        self.functions.setdefault(name, []).append(fn)
        self.by_symbol[fn.symbol] = fn

    def register_conversion(self, src: SType, dst: SType):
        self.implicit_conversions.setdefault(src, set()).add(dst)

    def has_conversion(self, src: SType, dst: SType) -> bool:
        return dst in self.implicit_conversions.get(src, ())

    def is_aggregate(self, name: str) -> bool:
        return any(
            f.kind == FN_AGGREGATE for f in self.functions.get(name.lower(), ())
        )

    def resolve(
        self,
        name: str,
        arg_types: Sequence[SType],
        allow_conversion: bool = True,
    ) -> SFunction:
        # reference: SymbolTable::resolve (symboltable.cc:71-171)
        fname = name.lower()
        candidates = self.functions.get(fname)
        if candidates is None:
            raise RuntimeError_(f"method not found: {name}")

        for cand in candidates:
            if len(cand.arg_types) != len(arg_types):
                continue
            if all(ct == at for ct, at in zip(cand.arg_types, arg_types)):
                return cand

        if allow_conversion:
            for cand in candidates:
                if len(cand.arg_types) != len(arg_types):
                    continue
                if not cand.allow_arg_conversion:
                    continue
                if all(
                    at == ct or self.has_conversion(at, ct)
                    for ct, at in zip(cand.arg_types, arg_types)
                ):
                    return cand

        expected = " or ".join(
            name + "<" + ", ".join(sql_typename(t) for t in c.arg_types) + ">"
            for c in candidates
        )
        actual = ", ".join(sql_typename(t) for t in arg_types)
        raise RuntimeError_(
            f"type error for {name}<{actual}>; expected: {expected}"
        )


def build_default_registry() -> FunctionRegistry:
    r = FunctionRegistry()

    # implicit conversions. The reference registers only UINT64→INT64 and
    # <any>→NIL (defaults.cc:40-46); the numeric promotions below are
    # required by its test suite (see module docstring).
    for t in (U, I, F, B, S, T):
        r.register_conversion(t, N)
    r.register_conversion(U, I)
    r.register_conversion(U, F)
    r.register_conversion(I, F)
    r.register_conversion(U, T)
    r.register_conversion(I, T)
    r.register_conversion(T, U)
    r.register_conversion(T, I)
    r.register_conversion(T, F)
    r.register_conversion(S, F)

    def reg(name, args, ret, fn, **kw):
        r.register(name, SFunction(name, tuple(args), ret, fn, **kw))

    # ---- aggregates (reference: expressions/aggregate.cc) ----
    agg = lambda kind: AggregateSpec(kind)
    r.register(
        "count",
        SFunction("count", (N,), U, None, kind=FN_AGGREGATE, aggregate=agg("count")),
    )
    r.register(
        "count_distinct",
        SFunction(
            "count_distinct",
            (U,),
            U,
            None,
            kind=FN_AGGREGATE,
            aggregate=agg("count_distinct"),
        ),
    )
    for t in (I, U, F):
        r.register(
            "sum",
            SFunction("sum", (t,), t, None, kind=FN_AGGREGATE, aggregate=agg("sum")),
        )
    for nm, kd in (("min", "min"), ("max", "max")):
        for t in (U, I, F, T):
            r.register(
                nm,
                SFunction(nm, (t,), t, None, kind=FN_AGGREGATE, aggregate=agg(kd)),
            )
    r.register(
        "mean",
        SFunction("mean", (F,), F, None, kind=FN_AGGREGATE, aggregate=agg("mean")),
    )

    # ---- boolean (reference: expressions/boolean.cc) ----
    reg("logical_and", [B, B], B, lambda a, b: a and b)
    reg("logical_or", [B, B], B, lambda a, b: a or b)
    reg("neg", [B], B, lambda a: not a)
    # unary '-' / '!' / NOT all parse to the same negate node
    # (parser.cc:127-135); numeric overloads arithmetic-negate
    reg("neg", [I], I, lambda a: wrap_i64(-a))
    reg("neg", [U], I, lambda a: wrap_i64(-a))
    reg("neg", [F], F, lambda a: -a)
    for t in (U, I, F, S, T):
        reg("cmp", [t, t], I, _cmp)
    for t, conv in ((U, False), (I, False), (F, False), (B, False), (S, False), (T, False)):
        reg("eq", [t, t], B, lambda a, b: a == b, allow_arg_conversion=conv)
        reg("neq", [t, t], B, lambda a, b: a != b, allow_arg_conversion=conv)
    for t in (U, I, F, S, T):
        reg("lt", [t, t], B, lambda a, b: a < b)
        reg("lte", [t, t], B, lambda a, b: a <= b)
        reg("gt", [t, t], B, lambda a, b: a > b)
        reg("gte", [t, t], B, lambda a, b: a >= b)

    # ---- conversions (reference: expressions/conversion.cc) ----
    for t in (U, I, F, B, S, T):
        reg("to_nil", [t], N, lambda *a: None)
    reg("to_int64", [U], I, wrap_i64)
    reg("to_int64", [F], I, lambda v: wrap_i64(int(v)))
    reg("to_int64", [B], I, lambda v: 1 if v else 0)
    reg("to_int64", [T], I, wrap_i64)
    reg(
        "to_int64",
        [S],
        I,
        lambda v: wrap_i64(
            int(_parse_leading_float(v.decode("utf-8", errors="surrogateescape")))
        ),
    )
    reg("to_uint64", [I], U, wrap_u64)
    reg("to_uint64", [F], U, lambda v: wrap_u64(int(v)))
    reg("to_uint64", [B], U, lambda v: 1 if v else 0)
    reg("to_uint64", [T], U, lambda v: v)
    reg(
        "to_uint64",
        [S],
        U,
        lambda v: wrap_u64(
            int(_parse_leading_float(v.decode("utf-8", errors="surrogateescape")))
        ),
    )
    reg("to_float64", [U], F, float)
    reg("to_float64", [I], F, float)
    reg("to_float64", [B], F, lambda v: 1.0 if v else 0.0)
    reg("to_float64", [T], F, float)
    reg(
        "to_float64",
        [S],
        F,
        lambda v: _parse_leading_float(v.decode("utf-8", errors="surrogateescape")),
    )
    reg("to_string", [N], S, lambda *a: b"NULL")
    reg("to_string", [U], S, lambda v: str(v).encode())
    reg("to_string", [I], S, lambda v: str(v).encode())
    reg("to_string", [F], S, _float_to_string)
    reg("to_string", [B], S, lambda v: b"true" if v else b"false")
    reg("to_string", [T], S, _ts_format)
    reg("to_string", [S], S, lambda v: v)
    for nm in ("to_timestamp64", "to_timestamp"):
        reg(nm, [I], T, lambda v: wrap_u64(v))
        reg(nm, [F], T, lambda v: wrap_u64(int(v)))
        reg(nm, [U], T, lambda v: v)
        reg(nm, [T], T, lambda v: v)

    # legacy-named conversion aliases (Runtime_test.cc:1809-1852)
    for src, fn in ((U, wrap_i64), (F, lambda v: wrap_i64(int(v))), (B, lambda v: 1 if v else 0), (T, wrap_i64)):
        reg("to_int", [src], I, fn)
    reg("to_int", [I], I, lambda v: v)
    reg(
        "to_int",
        [S],
        I,
        lambda v: wrap_i64(
            int(_parse_leading_float(v.decode("utf-8", errors="surrogateescape")))
        ),
    )
    for src in (U, I, B, T):
        reg("to_float", [src], F, float)
    reg("to_float", [F], F, lambda v: v)
    reg(
        "to_float",
        [S],
        F,
        lambda v: _parse_leading_float(v.decode("utf-8", errors="surrogateescape")),
    )
    reg("to_str", [S], S, lambda v: v)

    # ---- datetime (reference: expressions/datetime.cc) ----
    reg("now", [], T, lambda: int(_time.time() * kMicrosPerSecond), has_side_effects=True)
    reg("from_timestamp", [I], T, lambda v: wrap_u64(v * kMicrosPerSecond))
    reg("from_timestamp", [F], T, lambda v: wrap_u64(int(v * kMicrosPerSecond)))
    reg("date_trunc", [S, T], T, _date_trunc)
    reg("date_add", [T, S, S], T, _date_add)
    reg("time_at", [S], T, _time_at, has_side_effects=True)

    # ---- math (reference: expressions/math.cc) ----
    reg("add", [U, U], U, lambda a, b: wrap_u64(a + b))
    reg("add", [I, I], I, lambda a, b: wrap_i64(a + b))
    reg("add", [F, F], F, lambda a, b: a + b)
    reg("sub", [U, U], U, lambda a, b: wrap_u64(a - b))
    reg("sub", [I, I], I, lambda a, b: wrap_i64(a - b))
    reg("sub", [F, F], F, lambda a, b: a - b)
    reg("mul", [U, U], U, lambda a, b: wrap_u64(a * b))
    reg("mul", [I, I], I, lambda a, b: wrap_i64(a * b))
    reg("mul", [F, F], F, lambda a, b: a * b)

    def _fdiv(a, b):
        # float division; div-by-zero permitted for floats (math.cc:169)
        if b == 0:
            return math.inf if a > 0 else (-math.inf if a < 0 else math.nan)
        return a / b

    # `/` always produces float64 (Runtime_test.cc:501-509: 1/5 == 0.2);
    # the reference's registered int div overloads contradict its tests.
    reg("div", [F, F], F, _fdiv)

    def _umod(a, b):
        if b == 0:
            raise RuntimeError_("modulo by zero")
        return a % b

    def _imod(a, b):
        if b == 0:
            raise RuntimeError_("modulo by zero")
        return _trunc_mod(a, b)

    reg("mod", [U, U], U, _umod)
    reg("mod", [I, I], I, _imod)
    reg("mod", [F, F], F, lambda a, b: math.fmod(a, b) if b != 0 else math.nan)
    reg("pow", [U, U], U, lambda a, b: wrap_u64(int(float(a) ** float(b))))
    reg("pow", [I, I], I, lambda a, b: wrap_i64(int(float(a) ** float(b))))
    reg("pow", [F, F], F, lambda a, b: float(a) ** float(b))

    reg("truncate", [F], I, lambda v: wrap_i64(int(v)))
    reg("truncate", [U], U, lambda v: v)
    reg("truncate", [I], I, lambda v: v)

    # ---- string (reference: expressions/string.cc) ----
    def _lcase(v: bytes) -> bytes:
        return bytes(c + 32 if 65 <= c <= 90 else c for c in v)

    def _ucase(v: bytes) -> bytes:
        return bytes(c - 32 if 97 <= c <= 122 else c for c in v)

    reg("startswith", [S, S], B, lambda s, pre: s.startswith(pre))
    reg("endswith", [S, S], B, lambda s, suf: s.endswith(suf))
    for nm in ("lcase", "lowercase"):
        reg(nm, [S], S, _lcase)
    for nm in ("ucase", "uppercase"):
        reg(nm, [S], S, _ucase)
    for nm in ("substring", "substr"):
        reg(nm, [S, I], S, _substring)
        reg(nm, [S, I, I], S, _substring)
    reg("ltrim", [S], S, lambda v: v.lstrip(b" "))
    reg("rtrim", [S], S, lambda v: v.rstrip(b" "))
    reg("concat", [S, S], S, lambda a, b: a + b)
    reg("add", [S, S], S, lambda a, b: a + b)

    # ---- misc ----
    reg("fnv32", [S], U, lambda v: _fnv32(v.rstrip(b" ")))

    # isnull is handled specially by the expression builder (it must see
    # its argument's null tag, which ordinary calls strip); the registry
    # entry only provides the type signature.
    for t in (N, U, I, F, B, S, T):
        reg("isnull", [t], B, lambda *a: False)

    return r


DEFAULT_REGISTRY = build_default_registry()
