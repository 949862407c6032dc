"""Scaling-bench worker: self-populates an in-memory table shard and
serves the native protocol (reference analog: one evqld partition
server in an evqlslap run). Prints its port on stdout when ready.

Usage: python scripts/bench_worker.py <seed> <rows> <n_keys>
"""

import signal
import sys
import time

import numpy as np


def main():
    seed, rows, n_keys = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    from eventql_tpu.core.types import SType
    from eventql_tpu.db.table_service import MemoryTable, TableService
    from eventql_tpu.server.native_tcp import NativeTCPServer

    svc = TableService()
    table = MemoryTable(
        "ev",
        [("dim", SType.UINT64, False), ("v", SType.UINT64, False)],
        ["dim"],
        "dim",
        [],
    )
    # bulk load: bypass insert_row (the bench measures query scaling,
    # not ingest) — rows land directly as a cached columnar Relation
    rng = np.random.default_rng(seed)
    dim = rng.integers(0, n_keys, rows).astype(np.uint64)
    val = rng.integers(0, 1000, rows).astype(np.uint64)

    from eventql_tpu.exec.relation import Column, Relation

    rel = Relation(
        ["dim", "v"],
        [
            Column(SType.UINT64, dim, np.ones(rows, dtype=bool)),
            Column(SType.UINT64, val, np.ones(rows, dtype=bool)),
        ],
        rows,
    )
    table._relation_cache = rel
    table.rows = [None] * rows  # num_rows bookkeeping only
    svc.tables["ev"] = table

    server = NativeTCPServer(svc, port=0).start()
    print(server.port, flush=True)

    stop = []
    signal.signal(signal.SIGTERM, lambda *a: stop.append(1))
    signal.signal(signal.SIGINT, lambda *a: stop.append(1))
    while not stop:
        time.sleep(0.2)


if __name__ == "__main__":
    main()
