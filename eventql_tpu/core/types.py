"""SQL type system.

Mirrors the reference's SType enum and SValue scalar semantics
(reference: sql/svalue.h:41-49, sql/svalue.cc) but re-hosted for a
columnar engine: scalars (SValue) are used on the host for literals and
constant folding; columns live as fixed-width device arrays with
validity masks (see eventql_tpu.columnar.column).

Key parity rules replicated from the reference (see SURVEY.md App. A):

* integers are 64-bit with C wraparound semantics (sum_uint64 wraps,
  aggregate.cc:184-186); we emulate with explicit masking on host and
  with native int64/uint64 jax arrays on device.
* NULL-ness is a tag that travels only with *copied* values; any
  function call strips it (svalue.cc:928-958).
* string formatting: FLOAT64 via std::to_string (fixed 6 decimals),
  BOOL as true/false, TIMESTAMP64 as UTC %Y-%m-%d %H:%M:%S from
  microseconds (svalue.cc:592-660, UnixTime.cc:68-78).
"""

from __future__ import annotations

import enum
import time as _time
from dataclasses import dataclass
from typing import Any

U64_MASK = (1 << 64) - 1
I64_MIN = -(1 << 63)


class SType(enum.IntEnum):
    NIL = 0
    UINT64 = 1
    INT64 = 2
    FLOAT64 = 3
    BOOL = 4
    STRING = 5
    TIMESTAMP64 = 6


_TYPENAMES = {
    SType.NIL: "nil",
    SType.UINT64: "uint64",
    SType.INT64: "int64",
    SType.FLOAT64: "float64",
    SType.BOOL: "bool",
    SType.STRING: "string",
    SType.TIMESTAMP64: "timestamp64",
}


def sql_typename(t: SType) -> str:
    # reference: sql/svalue.cc:578-589
    return _TYPENAMES.get(t, "???")


def wrap_u64(v: int) -> int:
    return v & U64_MASK


def wrap_i64(v: int) -> int:
    v &= U64_MASK
    return v - (1 << 64) if v >= (1 << 63) else v


def format_timestamp(micros: int) -> str:
    # reference: UnixTime::toString (UnixTime.cc:68-78) — gmtime of
    # micros/1e6, strftime "%Y-%m-%d %H:%M:%S".
    tt = micros // 1000000
    try:
        tm = _time.gmtime(tt)
    except (OverflowError, OSError, ValueError):
        return ""
    return _time.strftime("%Y-%m-%d %H:%M:%S", tm)


def format_float(v: float) -> str:
    # reference: std::to_string(double) → printf %f → 6 fixed decimals
    return "%f" % (v,)


@dataclass(frozen=True)
class SValue:
    """A typed scalar with a null tag (host-side).

    data is: int for UINT64/INT64/TIMESTAMP64, float for FLOAT64,
    bool for BOOL, bytes for STRING, None for NIL.
    """

    stype: SType
    data: Any
    is_null: bool = False

    # -- constructors mirroring SValue::new* ------------------------------
    @staticmethod
    def new_null() -> "SValue":
        return SValue(SType.NIL, None, True)

    @staticmethod
    def new_uint64(v) -> "SValue":
        return SValue(SType.UINT64, wrap_u64(int(v)))

    @staticmethod
    def new_int64(v) -> "SValue":
        return SValue(SType.INT64, wrap_i64(int(v)))

    @staticmethod
    def new_float64(v) -> "SValue":
        return SValue(SType.FLOAT64, float(v))

    @staticmethod
    def new_bool(v) -> "SValue":
        return SValue(SType.BOOL, bool(v))

    @staticmethod
    def new_string(v) -> "SValue":
        if isinstance(v, str):
            v = v.encode("utf-8")
        return SValue(SType.STRING, bytes(v))

    @staticmethod
    def new_timestamp64(v) -> "SValue":
        return SValue(SType.TIMESTAMP64, wrap_u64(int(v)))

    # -- payload access with reference "pop" semantics --------------------
    # (pops ignore the null tag and read the stored payload;
    #  null encodes a zeroed payload: sql/CSTableScan.cc:884-890)
    def payload(self):
        if self.is_null:
            zero = {
                SType.NIL: None,
                SType.UINT64: 0,
                SType.INT64: 0,
                SType.FLOAT64: 0.0,
                SType.BOOL: False,
                SType.STRING: b"",
                SType.TIMESTAMP64: 0,
            }
            return zero[self.stype]
        return self.data

    def to_string(self) -> str:
        # reference: sql_tostring (sql/svalue.cc:592-660)
        if self.stype == SType.NIL or self.is_null:
            return "NULL"
        if self.stype in (SType.INT64, SType.UINT64):
            return str(self.data)
        if self.stype == SType.FLOAT64:
            return format_float(self.data)
        if self.stype == SType.STRING:
            return self.data.decode("utf-8", errors="surrogateescape")
        if self.stype == SType.TIMESTAMP64:
            return format_timestamp(self.data)
        if self.stype == SType.BOOL:
            return "true" if self.data else "false"
        raise ValueError("invalid SType")

    def to_expr_string(self) -> str:
        # reference: sql_toexprstring (sql/svalue.cc:668-...) — same as
        # to_string except STRING is escaped and double-quoted.
        if self.stype == SType.STRING and not self.is_null:
            s = self.data.decode("utf-8", errors="surrogateescape")
            # reference: sql_escape (svalue.cc:745-751)
            s = s.replace("\\", "\\\\").replace("'", "\\'").replace('"', '\\"')
            return '"%s"' % s
        return self.to_string()
