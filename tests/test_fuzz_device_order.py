"""Seeded randomized fuzz for the device ORDER BY scan routes
(device_exec.try_execute_device_scan_topk / _scan_order): random tables
with NULLs, NaN/-0.0 floats, INT64 extremes, UINT64_MAX (the flipped
zero-key corner), and dictionary strings incl. the literal "NULL";
random 1-3-key ORDER BY with asc/desc, optional WHERE and LIMIT/OFFSET.
Host engine and device route must return identical ResultLists — both
sorts are stable with ties breaking toward the lower row index, so any
difference is a real key-construction or kernel bug.
"""

import os
import random

import numpy as np
import pytest

from eventql_tpu.core.types import SType
from eventql_tpu.exec.relation import Column, Relation
from eventql_tpu.exec.runtime import RelationTableProvider, Runtime

SIZES = [1, 3, 50, 700, 5000]


def _run(provider, query: str, device: bool):
    prev = os.environ.get("EVENTQL_TPU_DEVICE")
    os.environ["EVENTQL_TPU_DEVICE"] = "1" if device else "0"
    try:
        rt = Runtime()
        txn = rt.new_transaction(provider)
        res = rt.build_query_plan(txn, query).execute(0)
        return (res.columns, res.rows)
    finally:
        if prev is None:
            os.environ.pop("EVENTQL_TPU_DEVICE", None)
        else:
            os.environ["EVENTQL_TPU_DEVICE"] = prev


def _make_table(rng: random.Random):
    n = rng.choice(SIZES)
    npr = np.random.default_rng(rng.randrange(1 << 30))
    # u: low-cardinality + extreme values (UINT64_MAX flips to key 0)
    u = npr.integers(0, 9, n).astype(np.uint64)
    if n > 2 and rng.random() < 0.5:
        hot = npr.integers(0, n, max(n // 20, 1))
        u[hot] = np.uint64(0xFFFFFFFFFFFFFFFF)
    u_valid = npr.random(n) >= (0.2 if rng.random() < 0.5 else 0.0)
    i = npr.integers(-50, 50, n).astype(np.int64)
    if n > 2 and rng.random() < 0.3:
        i[npr.integers(0, n, 2)] = np.iinfo(np.int64).min
        i[npr.integers(0, n, 2)] = np.iinfo(np.int64).max
    # floats: exact dyadics + NaN + -0.0 + infs
    f = (npr.integers(-512, 512, n) / 64.0).astype(np.float64)
    if n > 4 and rng.random() < 0.6:
        f[npr.integers(0, n, max(n // 30, 1))] = np.nan
        f[npr.integers(0, n, max(n // 30, 1))] = -0.0
        f[npr.integers(0, n, 1)] = np.inf
        f[npr.integers(0, n, 1)] = -np.inf
    f_valid = npr.random(n) >= (0.15 if rng.random() < 0.5 else 0.0)
    labels = [b"", b"NULL", b"a", b"Zz", b"mid", b"\xc3\xa9"]
    sv = [labels[k] for k in npr.integers(0, len(labels), n)]
    if rng.random() < 0.5:
        null_at = npr.random(n) < 0.25
        sv = [None if m else v for v, m in zip(sv, null_at)]
    rel = Relation(
        ["u", "i", "f", "s"],
        [
            Column(SType.UINT64, np.where(u_valid, u, 0).astype(np.uint64), u_valid),
            Column(SType.INT64, i, np.ones(n, bool)),
            Column(SType.FLOAT64, np.where(f_valid, f, 0.0), f_valid),
            Column.from_strings(sv),
        ],
        n,
    )
    p = RelationTableProvider()
    p.add_table("t", rel)
    return p


KEY_EXPRS = ["u", "i", "f", "s", "u + i", "i * 2", "f + 1.5", "u % 4"]
WHERE_TERMS = ["u < 7", "i >= 0", "f < 2.0", "u % 2 = 0", "i + u > 3"]


def _gen_order_query(rng: random.Random):
    nk = rng.randint(1, 3)
    keys = rng.sample(KEY_EXPRS, nk)
    specs = ", ".join(
        f"{k}{' desc' if rng.random() < 0.4 else (' asc' if rng.random() < 0.3 else '')}"
        for k in keys
    )
    # select everything the sort refers to, plus extras the host
    # materializes (incl. a computed string-independent expr)
    sel = "u, i, f, s, u + i as x"
    q = f"select {sel} from t"
    if rng.random() < 0.6:
        terms = rng.sample(WHERE_TERMS, rng.randint(1, 2))
        q += " where " + f" {rng.choice(['and', 'or'])} ".join(terms)
    q += f" order by {specs}"
    if rng.random() < 0.6:
        lim = rng.choice([0, 1, 2, 9, 100, 10000])
        q += f" limit {lim}"
        if rng.random() < 0.4:
            q += f" offset {rng.choice([0, 1, 5, 50])}"
    return q + ";"


@pytest.mark.parametrize("seed", range(30))
def test_fuzz_order_host_device_parity(seed):
    rng = random.Random(3000 + seed)
    provider = _make_table(rng)
    query = _gen_order_query(rng)
    host = _run(provider, query, device=False)
    dev = _run(provider, query, device=True)
    assert host == dev, (
        f"seed={seed} query={query!r}\nhost={host[1][:8]}\ndev ={dev[1][:8]}"
    )


def test_fuzz_order_is_not_vacuous():
    """Enough seeds must actually route to a device scan-order path."""
    from eventql_tpu.exec.device_exec import (
        try_execute_device_scan_order,
        try_execute_device_scan_topk,
    )
    from eventql_tpu.plan import nodes as qn

    prev = os.environ.get("EVENTQL_TPU_DEVICE")
    os.environ["EVENTQL_TPU_DEVICE"] = "1"
    try:
        hits = 0
        for s in range(30):
            rng = random.Random(3000 + s)
            provider = _make_table(rng)
            query = _gen_order_query(rng)
            rt = Runtime()
            txn = rt.new_transaction(provider)
            node = rt.build_query_plan(txn, query).nodes[0]
            if isinstance(node, qn.LimitNode) and isinstance(
                node.table, qn.OrderByNode
            ):
                if node.limit and try_execute_device_scan_topk(node, txn) is not None:
                    hits += 1
            elif isinstance(node, qn.OrderByNode):
                if try_execute_device_scan_order(node, txn) is not None:
                    hits += 1
        assert hits >= 15, f"only {hits}/30 order fuzz queries device-routed"
    finally:
        if prev is None:
            os.environ.pop("EVENTQL_TPU_DEVICE", None)
        else:
            os.environ["EVENTQL_TPU_DEVICE"] = prev
