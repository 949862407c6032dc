"""LSM-style durable table storage.

The observable storage contract of the reference's partition engine
(reference: db/partition_writer.cc LSMPartitionWriter — in-memory
arena → immutable columnar segment flush (commit :269-348), minor→major
compaction (:360+), primary-key upsert semantics via newest-wins
version resolution; read path merges segments newest→oldest with a
seen-key filter, server/sql/partition_cursor.cc:83-195), built on our
cstable v0.1 reader/writer.

Layout on disk:
  <datadir>/<table>/table.json          schema + metadata
  <datadir>/<table>/segment-<nnn>.cst   immutable columnar segments
"""

from __future__ import annotations

import json
import os
import threading
from typing import Dict, List, Optional

import numpy as np

from eventql_tpu.columnar.cstable import CSTableReader
from eventql_tpu.columnar.cstable_v2 import write_cstable_v2 as write_cstable
from eventql_tpu.core.errors import RuntimeError_
from eventql_tpu.core.types import SType, SValue
from eventql_tpu.db.table_service import (
    MemoryTable,
    TableService,
    _flatten_columns,
)
from eventql_tpu.exec.relation import Column, Relation

# reference: db/partition_writer.cc:64-65 (scaled down: rows per
# segment flush; the 512 MB / 2M-row numbers are partition-split
# thresholds there)
DEFAULT_ARENA_FLUSH_ROWS = 100_000


class LSMTable(MemoryTable):
    """A MemoryTable whose rows durably persist as LSM segments."""

    def __init__(
        self,
        base_dir: str,
        name: str,
        columns,
        primary_key,
        partition_key,
        properties,
        arena_flush_rows: int = DEFAULT_ARENA_FLUSH_ROWS,
    ):
        super().__init__(name, columns, primary_key, partition_key, properties)
        self.base_dir = base_dir
        self.dir = os.path.join(base_dir, name)
        self.arena_flush_rows = arena_flush_rows
        os.makedirs(self.dir, exist_ok=True)
        self._write_config()
        self._segments: List[str] = self._list_segments()

    # -- config ---------------------------------------------------------
    def _write_config(self):
        cfg = {
            "table": self.name,
            "columns": [
                {"name": n, "type": int(t), "repeated": r}
                for n, t, r in self.columns
            ],
            "primary_key": self.primary_key,
            "partition_key": self.partition_key,
            "properties": self.properties,
        }
        tmp = os.path.join(self.dir, "table.json.tmp")
        with open(tmp, "w") as f:
            json.dump(cfg, f)
        os.replace(tmp, os.path.join(self.dir, "table.json"))

    @staticmethod
    def open(base_dir: str, name: str) -> "LSMTable":
        path = os.path.join(base_dir, name, "table.json")
        with open(path) as f:
            cfg = json.load(f)
        t = LSMTable(
            base_dir,
            name,
            [(c["name"], SType(c["type"]), c["repeated"]) for c in cfg["columns"]],
            cfg["primary_key"],
            cfg.get("partition_key"),
            list(cfg.get("properties", {}).items()),
        )
        return t

    def _list_segments(self) -> List[str]:
        segs = [
            f
            for f in os.listdir(self.dir)
            if f.startswith("segment-") and f.endswith(".cst")
        ]
        return sorted(segs)

    # -- writes ---------------------------------------------------------
    def insert_row(self, row: Dict[str, SValue], obj=None):
        super().insert_row(row, obj=obj)
        if len(self.rows) >= self.arena_flush_rows:
            self.commit()

    def commit(self):
        """Flush the arena to an immutable segment
        (reference: LSMPartitionWriter::commit, partition_writer.cc:
        269-348 — arena → cstable, then arena cleared)."""
        if not self.rows:
            return
        rel = MemoryTable.to_relation(self)
        seq = len(self._segments)
        seg_name = f"segment-{seq:06d}.cst"
        tmp = os.path.join(self.dir, seg_name + ".tmp")
        write_cstable(tmp, rel)
        os.replace(tmp, os.path.join(self.dir, seg_name))
        self._segments.append(seg_name)
        self.rows = []
        self._relation_cache = None

    def compact(self):
        """Fold all segments into one major segment with upsert
        resolution applied (reference: LSMPartitionWriter::compact +
        SimpleCompactionStrategy, db/compaction_strategy.h:58-77)."""
        self.commit()
        rel = self.to_relation()
        for seg in self._segments:
            os.unlink(os.path.join(self.dir, seg))
        self._segments = []
        if rel.num_rows:
            seg_name = "segment-000000.cst"
            tmp = os.path.join(self.dir, seg_name + ".tmp")
            write_cstable(tmp, rel)
            os.replace(tmp, os.path.join(self.dir, seg_name))
            self._segments = [seg_name]
        self._relation_cache = None

    # -- reads ----------------------------------------------------------
    def to_relation(self) -> Relation:
        """Merged view: arena + segments newest→oldest with primary-key
        upsert (newest wins), like the reference's partition cursor
        visibility rules."""
        if self._relation_cache is not None:
            return self._relation_cache

        parts: List[Relation] = []
        if self.rows:
            parts.append(MemoryTable.to_relation(self))
        for seg in reversed(self._segments):
            parts.append(self._read_segment(seg))

        if not parts:
            rel = MemoryTable.to_relation(self)  # empty, correct schema
            self._relation_cache = rel
            return rel

        if self.primary_key:
            merged = self._merge_upsert(parts)
        else:
            merged = _concat_relations(list(reversed(parts)))
        self._relation_cache = merged
        return merged

    def _read_segment(self, seg: str) -> Relation:
        reader = CSTableReader(os.path.join(self.dir, seg))
        rel = reader.to_relation(flat_only=True)
        # align to current schema (columns added later are NULL)
        cols, names = [], []
        by_name = dict(zip(rel.names, rel.columns))
        n = rel.num_rows
        from eventql_tpu.exec.relation import dtype_for

        for cname, ctype, _rep in self.columns:
            names.append(cname)
            if cname in by_name:
                cols.append(by_name[cname])
            elif ctype == SType.STRING:
                cols.append(
                    Column(
                        SType.STRING,
                        np.zeros(n, np.int32),
                        np.zeros(n, bool),
                        np.array([b""], dtype=object),
                    )
                )
            else:
                cols.append(
                    Column(ctype, np.zeros(n, dtype=dtype_for(ctype)), np.zeros(n, bool))
                )
        return Relation(names, cols, n)

    def _merge_upsert(self, parts_newest_first: List[Relation]) -> Relation:
        """Newest-first scan keeping the first occurrence of each
        primary key (the reference's seen-id upsert filter)."""
        keep_parts: List[Relation] = []
        seen = set()
        pk_idx = [
            [i for i, c in enumerate(self.columns) if c[0] == k][0]
            for k in self.primary_key
        ]
        for rel in parts_newest_first:
            keep = []
            for r in range(rel.num_rows):
                key = tuple(
                    rel.columns[i].value_at(r).payload() for i in pk_idx
                )
                if key in seen:
                    continue
                seen.add(key)
                keep.append(r)
            keep_parts.append(rel.gather(np.array(keep, dtype=np.int64)))
        # output order: oldest part first, insertion order within
        return _concat_relations(list(reversed(keep_parts)))


def _concat_relations(parts: List[Relation]) -> Relation:
    from eventql_tpu.parallel.partitioned import _concat_columns

    names = parts[0].names
    cols = [
        _concat_columns([p.columns[i] for p in parts])
        for i in range(len(names))
    ]
    return Relation(list(names), cols, sum(p.num_rows for p in parts))


class DurableTableService(TableService):
    """TableService persisting to an on-disk datadir (the standalone
    evqld storage mode)."""

    # compact once a table accumulates this many segments (the analog of
    # SimpleCompactionStrategy's small-table threshold,
    # db/compaction_strategy.cc:40-76)
    COMPACT_SEGMENT_THRESHOLD = 8

    def __init__(self, datadir: str, arena_flush_rows: int = DEFAULT_ARENA_FLUSH_ROWS):
        super().__init__()
        self.datadir = datadir
        self.arena_flush_rows = arena_flush_rows
        self._compaction_thread = None
        self._compaction_stop = threading.Event()
        os.makedirs(datadir, exist_ok=True)
        for name in sorted(os.listdir(datadir)):
            if os.path.exists(os.path.join(datadir, name, "table.json")):
                self.tables[name] = LSMTable.open(datadir, name)

    # -- background compaction (reference: db/compaction_worker.cc —
    # a worker thread drains a queue of partitions needing compaction;
    # here a periodic sweep over tables past the segment threshold) ----
    def start_compaction_worker(self, interval: float = 5.0):
        from eventql_tpu.utils.stats import evqld_stats

        def run():
            while not self._compaction_stop.wait(interval):
                pending = [
                    t
                    for t in list(self.tables.values())
                    if len(t._segments) >= self.COMPACT_SEGMENT_THRESHOLD
                ]
                evqld_stats().compaction_queue_length.set(len(pending))
                for t in pending:
                    t.compact()
                evqld_stats().compaction_queue_length.set(0)

        self._compaction_thread = threading.Thread(target=run, daemon=True)
        self._compaction_thread.start()

    def stop_compaction_worker(self):
        if self._compaction_thread:
            self._compaction_stop.set()
            self._compaction_thread.join(timeout=10)
            self._compaction_thread = None

    def create_table(self, node) -> None:
        if node.table_name in self.tables:
            raise RuntimeError_(f"table already exists: '{node.table_name}'")
        columns = _flatten_columns(node.columns)
        if node.primary_key:
            by_name = {c[0]: c[1] for c in columns}
            first = node.primary_key[0]
            if first not in by_name:
                raise RuntimeError_(f"column not found: '{first}'")
            if by_name[first] not in (
                SType.TIMESTAMP64,
                SType.STRING,
                SType.UINT64,
            ):
                raise RuntimeError_(
                    "first column in the PRIMARY KEY must be of type "
                    "DATETIME, STRING or UINT64"
                )
        if any(c[2] for c in columns):
            raise RuntimeError_(
                "REPEATED columns are not supported on durable tables yet"
            )
        self.tables[node.table_name] = LSMTable(
            self.datadir,
            node.table_name,
            columns,
            list(node.primary_key),
            node.partition_key,
            node.properties,
            self.arena_flush_rows,
        )

    def drop_table(self, table_name: str) -> None:
        table = self.tables.get(table_name)
        if table is None:
            raise RuntimeError_(f"table not found: '{table_name}'")
        import shutil

        shutil.rmtree(table.dir, ignore_errors=True)
        del self.tables[table_name]

    def commit_all(self):
        for t in self.tables.values():
            if isinstance(t, LSMTable):
                t.commit()
