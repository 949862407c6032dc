"""Per-query execution statistics and shard-granular progress.

The analog of the reference's csql::ExecutionContext
(sql/scheduler/execution_context.h:30-54: task counters feeding
QueryPlan::getProgress) plus the rows/bytes-scanned counters whose
wire fields the reference defines but never fills
(frames/query_progress.cc:63-70, frames/query_result.cc:78-82 write
zeros) — here they carry real values from the operator layer.

Thread-safe: distributed fan-outs increment task counters from worker
threads; the server's heartbeat thread reads a consistent snapshot.
"""

from __future__ import annotations

import threading


class ExecutionContext:
    __slots__ = (
        "_lock",
        "rows_scanned",
        "bytes_scanned",
        "rows_modified",
        "num_tasks",
        "num_tasks_completed",
        "num_tasks_failed",
    )

    def __init__(self):
        self._lock = threading.Lock()
        self.rows_scanned = 0
        self.bytes_scanned = 0
        self.rows_modified = 0
        # shard/partition tasks (reference: incrementNumTasks* — each
        # distributed shard is one task; local statements register one)
        self.num_tasks = 0
        self.num_tasks_completed = 0
        self.num_tasks_failed = 0

    # -- operator-layer counters ----------------------------------------
    def count_scan(self, rows: int, nbytes: int = 0):
        with self._lock:
            self.rows_scanned += int(rows)
            self.bytes_scanned += int(nbytes)
        # process-wide aggregate for /eventql/stats + statsd
        from eventql_tpu.utils.stats import evqld_stats

        evqld_stats().num_rows_scanned.incr(int(rows))

    def count_modified(self, rows: int):
        with self._lock:
            self.rows_modified += int(rows)

    # -- task-granular progress -----------------------------------------
    def add_tasks(self, n: int = 1):
        with self._lock:
            self.num_tasks += int(n)

    def complete_task(self, n: int = 1):
        with self._lock:
            self.num_tasks_completed += int(n)

    def fail_task(self, n: int = 1):
        with self._lock:
            self.num_tasks_failed += int(n)

    def progress_permill(self) -> int:
        """Task-granular progress (reference: getProgress() =
        completed / total over shard tasks)."""
        with self._lock:
            if self.num_tasks <= 0:
                return 0
            done = self.num_tasks_completed + self.num_tasks_failed
            return min(1000, 1000 * done // self.num_tasks)

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "rows_scanned": self.rows_scanned,
                "bytes_scanned": self.bytes_scanned,
                "rows_modified": self.rows_modified,
                "num_tasks": self.num_tasks,
                "num_tasks_completed": self.num_tasks_completed,
                "num_tasks_failed": self.num_tasks_failed,
            }
