"""Columnar batch representation.

The engine's unit of data flow is a Relation: a set of named columns,
each a fixed-width vector plus a validity (non-null) mask — the
columnar re-design of the reference's SVector byte buffers
(reference: sql/svalue.h:131+, layout sql/CSTableScan.cc:860-995).

Strings are dictionary-encoded: a column holds int32 ids into a
per-column dictionary of byte strings. Fixed-width data (and string
ids) can live on device (jax arrays) in the accelerated path; this
host representation uses numpy with identical semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from eventql_tpu.core.errors import RuntimeError_
from eventql_tpu.core.types import SType, SValue

_DTYPES = {
    SType.UINT64: np.uint64,
    SType.INT64: np.int64,
    SType.FLOAT64: np.float64,
    SType.BOOL: np.bool_,
    SType.TIMESTAMP64: np.uint64,
    SType.STRING: np.int32,  # dictionary ids
    SType.NIL: np.uint8,
}


def dtype_for(stype: SType):
    return _DTYPES[stype]


@dataclass
class Column:
    stype: SType
    data: np.ndarray
    valid: np.ndarray
    dictionary: Optional[np.ndarray] = None  # object array of bytes (STRING)
    # Dremel occurrence mask for columns produced by nested-record row
    # expansion: True where the column's repetition group occurs in the
    # expanded row. None (every flat column) = occurs in every row.
    # count(x) accumulates per occurrence, NULL or not (reference:
    # CSTableScan.cc:441-452 rep-level gating + aggregate.cc:35-38
    # unconditional count_acc) — so it counts all rows on flat scans
    # and per-occurrence on nested ones; validity plays no part.
    presence: Optional[np.ndarray] = None

    def __len__(self):
        return len(self.data)

    @staticmethod
    def from_scalar(value: SValue, n: int) -> "Column":
        stype = value.stype
        if stype == SType.STRING:
            data = np.zeros(n, dtype=np.int32)
            dictionary = np.array([value.payload()], dtype=object)
            valid = np.full(n, not value.is_null)
            return Column(stype, data, valid, dictionary)
        if stype == SType.NIL:
            return Column(stype, np.zeros(n, dtype=np.uint8), np.zeros(n, dtype=bool))
        data = np.full(n, value.payload(), dtype=dtype_for(stype))
        valid = np.full(n, not value.is_null)
        return Column(stype, data, valid)

    @staticmethod
    def from_strings(values: List[Optional[bytes]]) -> "Column":
        """Build a dictionary-encoded string column; None = NULL."""
        n = len(values)
        valid = np.array([v is not None for v in values], dtype=bool)
        raw = np.array([v if v is not None else b"" for v in values], dtype=object)
        uniq, ids = np.unique(raw.astype(bytes), return_inverse=True)
        dictionary = np.array([bytes(u) for u in uniq], dtype=object)
        return Column(SType.STRING, ids.astype(np.int32), valid, dictionary)

    def materialize_strings(self) -> np.ndarray:
        """Return an object array of bytes for a STRING column (null
        payload = b'', mirroring the reference's zeroed null payloads)."""
        assert self.stype == SType.STRING
        out = self.dictionary[self.data]
        if not self.valid.all():
            out = out.copy()
            out[~self.valid] = b""
        return out

    def gather(self, indices: np.ndarray) -> "Column":
        return Column(
            self.stype,
            self.data[indices],
            self.valid[indices],
            self.dictionary,
            self.presence[indices] if self.presence is not None else None,
        )

    def slice_rows(self, lo: int, hi: int) -> "Column":
        """Zero-copy row window [lo, hi) (numpy views)."""
        return Column(
            self.stype,
            self.data[lo:hi],
            self.valid[lo:hi],
            self.dictionary,
            self.presence[lo:hi] if self.presence is not None else None,
        )

    def value_at(self, i: int) -> SValue:
        if self.stype == SType.NIL or not self.valid[i]:
            if self.stype == SType.NIL:
                return SValue.new_null()
            # typed null: keep type, null tag
            return SValue(self.stype, self._py(i), True)
        return SValue(self.stype, self._py(i), False)

    def _py(self, i: int):
        if self.stype == SType.STRING:
            return bytes(self.dictionary[self.data[i]]) if self.valid[i] else b""
        if self.stype == SType.NIL:
            return None
        v = self.data[i]
        if self.stype in (SType.UINT64, SType.TIMESTAMP64):
            return int(np.uint64(v))
        if self.stype == SType.INT64:
            return int(np.int64(v))
        if self.stype == SType.FLOAT64:
            return float(v)
        if self.stype == SType.BOOL:
            return bool(v)
        raise RuntimeError_("invalid column type")

    def format_value(self, i: int) -> str:
        # reference: sql_tostring (sql/svalue.cc:592-660)
        return self.value_at(i).to_string()

    def format_all(self) -> List[str]:
        """Whole-column sql_tostring — byte-identical to per-row
        format_value but vectorized (result materialization is on the
        serving hot path; per-cell SValue construction costs ~1 µs)."""
        from eventql_tpu.core.types import format_timestamp

        n = len(self.data)
        if self.stype == SType.NIL:
            return ["NULL"] * n
        valid = self.valid
        if self.stype == SType.STRING:
            strs = self.dictionary[self.data]
            return [
                s.decode("utf-8", errors="surrogateescape")
                if v
                else "NULL"
                for s, v in zip(strs, valid)
            ]
        if self.stype in (SType.UINT64, SType.INT64):
            out = self.data.astype("U21")
        elif self.stype == SType.FLOAT64:
            out = np.char.mod("%f", self.data)
        elif self.stype == SType.BOOL:
            out = np.where(self.data, "true", "false")
        elif self.stype == SType.TIMESTAMP64:
            return [
                format_timestamp(int(t)) if v else "NULL"
                for t, v in zip(self.data, valid)
            ]
        else:
            raise RuntimeError_("invalid column type")
        if not valid.all():
            out = np.where(valid, out, "NULL")
        return out.tolist()


@dataclass
class Relation:
    names: List[str]
    columns: List[Column]
    num_rows: int

    @staticmethod
    def empty(names: List[str], stypes: List[SType]) -> "Relation":
        cols = [
            Column(
                t,
                np.zeros(0, dtype=dtype_for(t)),
                np.zeros(0, dtype=bool),
                np.zeros(0, dtype=object) if t == SType.STRING else None,
            )
            for t in stypes
        ]
        return Relation(list(names), cols, 0)

    def column(self, idx: int) -> Column:
        return self.columns[idx]

    def iter_chunks(self, chunk_rows: int):
        """Yield this relation as <=chunk_rows-row slices, preserving
        row order — the shared slicer behind every streaming-cursor
        source (a relation at or under the chunk size yields itself,
        no gather copy)."""
        if self.num_rows <= chunk_rows:
            if self.num_rows:
                yield self
            return
        for lo in range(0, self.num_rows, chunk_rows):
            hi = min(lo + chunk_rows, self.num_rows)
            yield self.gather(np.arange(lo, hi, dtype=np.int64))

    def gather(self, indices: np.ndarray) -> "Relation":
        return Relation(
            list(self.names),
            [c.gather(indices) for c in self.columns],
            len(indices),
        )

    def head(self, n_cols: int) -> "Relation":
        return Relation(self.names[:n_cols], self.columns[:n_cols], self.num_rows)
