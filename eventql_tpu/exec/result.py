"""Query results (reference: sql/result_list.h/.cc, result_cursor.h)."""

from __future__ import annotations

from typing import List

from eventql_tpu.exec.relation import Relation


class ResultList:
    def __init__(self, columns: List[str], rows: List[List[str]]):
        self.columns = columns
        self.rows = rows

    @staticmethod
    def from_relation(result_columns: List[str], rel: Relation) -> "ResultList":
        ncols = len(result_columns)
        cols = rel.columns[:ncols]
        # whole-column formatting (vectorized sql_tostring), then a
        # zip-transpose into rows
        formatted = [c.format_all() for c in cols]
        rows = [list(r) for r in zip(*formatted)]
        if not cols:
            rows = [[] for _ in range(rel.num_rows)]
        return ResultList(list(result_columns), rows)

    @property
    def num_columns(self) -> int:
        return len(self.columns)

    @property
    def num_rows(self) -> int:
        return len(self.rows)

    def get_row(self, i: int) -> List[str]:
        return self.rows[i]

    def debug_csv(self, sep=";") -> str:
        out = [sep.join(self.columns)]
        for r in self.rows:
            out.append(sep.join(r))
        return "\n".join(out) + "\n"
