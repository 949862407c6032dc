"""Concurrent serving: the device-route program/column caches must be
safe under the thread-per-connection server (reference: concurrent
sessions are the normal case, db/database.cc:555-573), and concurrent
first-queries must not duplicate program builds (single-flight in
device_exec._cached_jit)."""

import json
import os
import threading

import numpy as np
import pytest

import eventql_tpu.exec.device_exec as dx
from eventql_tpu.core.types import SType
from eventql_tpu.db.table_service import TableService
from eventql_tpu.exec.relation import Column, Relation
from eventql_tpu.plan.nodes import ColumnDefinition, CreateTableNode
from eventql_tpu.server.native_tcp import NativeTCPClient, NativeTCPServer
from eventql_tpu.utils.stats import evqld_stats


def _mk_service(n=20000, seed=3):
    rng = np.random.default_rng(seed)
    svc = TableService()
    svc.create_table(
        CreateTableNode(
            "ev",
            [
                ColumnDefinition("k", "UINT64"),
                ColumnDefinition("v", "UINT64"),
            ],
            [],
            None,
            [],
        )
    )
    keys = rng.integers(0, 53, n).astype(np.uint64)
    vals = rng.integers(0, 1000, n).astype(np.uint64)
    svc.tables["ev"].insert_batch(
        Relation(
            ["k", "v"],
            [
                Column(SType.UINT64, keys, np.ones(n, bool)),
                Column(SType.UINT64, vals, np.ones(n, bool)),
            ],
            n,
        )
    )
    return svc


QUERY = "select k, count(1), sum(v) from ev group by k order by k;"


@pytest.fixture
def device_env():
    prev = os.environ.get("EVENTQL_TPU_DEVICE")
    os.environ["EVENTQL_TPU_DEVICE"] = "1"
    yield
    if prev is None:
        os.environ.pop("EVENTQL_TPU_DEVICE", None)
    else:
        os.environ["EVENTQL_TPU_DEVICE"] = prev


def _run_clients(port, query, n_clients, per_client):
    results = [None] * n_clients
    errors = []

    def one(i):
        try:
            c = NativeTCPClient("127.0.0.1", port)
            try:
                out = []
                for _ in range(per_client):
                    out.append(c.query(query, batch_size=500))
                results[i] = out
            finally:
                c.close()
        except Exception as e:  # surface into the main thread
            errors.append(e)

    threads = [
        threading.Thread(target=one, args=(i,)) for i in range(n_clients)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    return results


def test_concurrent_device_groupby_no_duplicate_builds(device_env):
    svc = _mk_service()
    server = NativeTCPServer(svc, port=0)
    server.start()
    try:
        stats = evqld_stats()

        # cold single-threaded run: how many program keys does this
        # query build?
        dx._PROGRAM_CACHE = None
        b0 = stats.device_program_builds.get()
        ref = _run_clients(server.port, QUERY, 1, 1)[0][0]
        expected_builds = stats.device_program_builds.get() - b0
        assert expected_builds >= 1  # the device route really ran

        # cold CONCURRENT run: 8 clients race the first build — the
        # single-flight must hold builds to the single-threaded count
        dx._PROGRAM_CACHE = None
        b1 = stats.device_program_builds.get()
        outs = _run_clients(server.port, QUERY, 8, 3)
        concurrent_builds = stats.device_program_builds.get() - b1
        assert concurrent_builds == expected_builds, (
            concurrent_builds,
            expected_builds,
        )
        for out in outs:
            for res in out:
                assert res == ref
    finally:
        server.stop()


def test_concurrent_mixed_routes_parity(device_env):
    """8 clients × mixed statements (device GROUP BY, streamed SELECT,
    LIMIT) against one server: every client sees the single-client
    answer."""
    svc = _mk_service(n=5000)
    server = NativeTCPServer(svc, port=0)
    server.start()
    try:
        queries = [
            QUERY,
            "select k, v from ev limit 40;",
            "select v from ev where k = 7 limit 10;",
            "select count(1) from ev;",
        ]
        refs = {}
        c = NativeTCPClient("127.0.0.1", server.port)
        try:
            for q in queries:
                refs[q] = c.query(q, batch_size=100)
        finally:
            c.close()

        errors = []

        def one(i):
            try:
                c = NativeTCPClient("127.0.0.1", server.port)
                try:
                    for j in range(6):
                        q = queries[(i + j) % len(queries)]
                        assert c.query(q, batch_size=100) == refs[q], q
                finally:
                    c.close()
            except Exception as e:
                errors.append(e)

        threads = [
            threading.Thread(target=one, args=(i,)) for i in range(8)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
    finally:
        server.stop()
