"""Seeded randomized differential fuzz: host engine vs device path.

Generates random tables (sizes 0..20k, null masks, negative ints,
near-wraparound uint64s, cardinalities from 1 to beyond kernel
capacity) and random GROUP BY queries over the device-routable surface
(sum/count/min/max/mean/count_distinct, arithmetic + if() + mod-by-
literal exprs, WHERE conjunctions, ORDER BY, LIMIT), then runs each
query on the host engine and on the device path and requires identical
ResultLists. Float columns use multiples of 1/64 so sums are exact in
binary regardless of accumulation order — any row difference is a real
kernel bug, not float reassociation.

The generator is deterministic per seed; failures reproduce by seed.
"""

import os
import random

import numpy as np
import pytest

from eventql_tpu.core.types import SType
from eventql_tpu.exec.relation import Column, Relation
from eventql_tpu.exec.runtime import RelationTableProvider, Runtime

SIZES = [0, 1, 7, 100, 3000, 20000]
CARDS = [1, 2, 17, 257, 4099]


def _make_table(rng: random.Random):
    n = rng.choice(SIZES)
    card = rng.choice(CARDS)
    npr = np.random.default_rng(rng.randrange(1 << 30))
    k1 = npr.integers(0, card, max(n, 1))[:n].astype(np.uint64)
    k2 = npr.integers(-20, 20, max(n, 1))[:n].astype(np.int64)
    # values: mostly small, a few near the uint64 wrap boundary
    v = npr.integers(0, 10_000, max(n, 1))[:n].astype(np.uint64)
    if n and rng.random() < 0.3:
        hot = npr.integers(0, n, max(n // 50, 1))
        v[hot] = np.uint64(1 << 63) + v[hot]
    v_valid = npr.random(max(n, 1))[:n] < (1.0 if rng.random() < 0.5 else 0.85)
    # floats: multiples of 1/64 — exactly representable, order-proof sums
    f = (npr.integers(-4096, 4096, max(n, 1))[:n] / 64.0).astype(np.float64)
    f_valid = npr.random(max(n, 1))[:n] < (1.0 if rng.random() < 0.5 else 0.9)
    rel = Relation(
        ["k1", "k2", "v", "f"],
        [
            Column(SType.UINT64, k1, np.ones(n, bool)),
            Column(SType.INT64, k2, np.ones(n, bool)),
            Column(SType.UINT64, np.where(v_valid, v, 0).astype(np.uint64),
                   v_valid.copy()),
            Column(SType.FLOAT64, np.where(f_valid, f, 0.0), f_valid.copy()),
        ],
        n,
    )
    p = RelationTableProvider()
    p.add_table("t", rel)
    return p


GROUP_EXPRS = [
    "k1",
    "k2",
    "k1 % 13",
    "k1 % 3",
    "if(k2 > 0, 1, 0)",
    "k1 + 1",
]

AGG_EXPRS = [
    "count(1)",
    "count(v)",
    "sum(v)",
    "sum(k2)",
    "sum(v + 1)",
    "min(k2)",
    "max(k2)",
    "min(f)",
    "max(f)",
    "sum(f)",
    "mean(f)",
    "mean(k2)",
    "count_distinct(v)",
    # count_distinct(int64) is a type error in the reference too
    "sum(f * 2.0)",
    "max(v)",
]

WHERE_TERMS = [
    "v < 5000",
    "k1 > 5",
    "k2 >= 0",
    "f > 0.0",
    "v % 7 = 1",
    "k2 < 10",
]


def _gen_query(rng: random.Random) -> str:
    n_keys = rng.choice([0, 1, 1, 2])
    keys = rng.sample(GROUP_EXPRS, n_keys)
    n_aggs = rng.randint(1, 3)
    aggs = rng.sample(AGG_EXPRS, n_aggs)
    select = ", ".join(keys + aggs)
    q = f"select {select} from t"
    if rng.random() < 0.6:
        # 1-3 terms with mixed and/or joiners: exercises the fused
        # kernel's two compare slots, the OR pred_combine, and the
        # r5 general mask-stream predicate tier
        terms = rng.sample(WHERE_TERMS, rng.randint(1, 3))
        clause = terms[0]
        for t in terms[1:]:
            clause += f" {rng.choice(['and', 'or'])} {t}"
        q += " where " + clause
    if keys:
        q += " group by " + ", ".join(keys)
        if rng.random() < 0.3:
            # HAVING over one of the selected aggregates (round 5):
            # rides ABOVE the device/mesh group-by fast paths
            agg = rng.choice(aggs)
            thr = rng.choice([0, 1, 100, 100000])
            op = rng.choice([">", ">=", "<", "!="])
            q += f" having {agg} {op} {thr}"
    # order by every output ordinal → fully deterministic row order
    ordinals = ", ".join(
        f"{i + 1}{' desc' if rng.random() < 0.3 else ''}"
        for i in range(len(keys) + n_aggs)
    )
    q += f" order by {ordinals}"
    if rng.random() < 0.3:
        q += f" limit {rng.choice([0, 1, 5, 1000])}"
    return q + ";"


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


def _eligible(provider, query: str) -> bool:
    from eventql_tpu.exec.device_exec import device_plan_eligible

    rt = Runtime()
    txn = rt.new_transaction(provider)
    plan = rt.build_query_plan(txn, query)
    return any(device_plan_eligible(s) for s in plan.nodes)


@pytest.mark.parametrize("seed", range(40))
def test_fuzz_host_device_parity(seed):
    rng = random.Random(1000 + seed)
    provider = _make_table(rng)
    query = _gen_query(rng)
    host = _run(provider, query, device=False)
    dev = _run(provider, query, device=True)
    assert host == dev, (
        f"seed={seed} query={query!r}\nhost={host[1][:8]}\ndev ={dev[1][:8]}"
    )


def test_fuzz_is_not_vacuous():
    """A majority of generated queries must actually be device-routable,
    otherwise the fuzz silently degrades to host-vs-host."""
    rng_all = [random.Random(1000 + s) for s in range(40)]
    hits = 0
    for rng in rng_all:
        provider = _make_table(rng)
        query = _gen_query(rng)
        if _eligible(provider, query):
            hits += 1
    assert hits >= 24, f"only {hits}/40 fuzz queries device-eligible"


# the divergence the fuzzer's design excludes by construction, pinned
# explicitly: integer modulo by zero must raise on BOTH paths
# (reference: sql/expressions/math.cc:178-206)
def test_mod_by_zero_raises_on_device_path():
    rng = random.Random(7)
    provider = _make_table(rng)
    q = "select k1, sum(v % 0) from t group by k1 order by 1;"
    for device in (False, True):
        with pytest.raises(Exception) as exc:
            _run(provider, q, device)
        assert "modulo by zero" in str(exc.value)


# ---------------------------------------------------------------------------
# Join-route fuzz: SELECT d.attr, aggs(f-exprs) FROM f JOIN d ON f.k = d.k
# [WHERE fact preds] GROUP BY d.attr — the device join route
# (device_exec.try_execute_device_join_groupby); out-of-subset variants
# (LEFT JOIN, residual conditions) must fall back and still agree.

def _make_join_tables(rng: random.Random):
    n = rng.choice([0, 1, 100, 5000, 20000])
    d = rng.choice([1, 16, 257, 1024])
    npr = np.random.default_rng(rng.randrange(1 << 30))
    # dim: unique u64 keys (possibly sparse ids), attr column for grouping
    dk = npr.permutation(d * 3)[:d].astype(np.uint64)
    dattr = npr.integers(0, 9, max(d, 1))[:d].astype(np.uint64)
    # facts: keys drawn from dim keys, plus some misses (no dim match)
    fk = dk[npr.integers(0, d, max(n, 1))][:n].astype(np.uint64)
    if n and rng.random() < 0.5:
        miss = npr.random(n) < 0.1
        fk = np.where(miss, fk + np.uint64(d * 5), fk)
    fv = npr.integers(0, 1000, max(n, 1))[:n].astype(np.uint64)
    fv_valid = npr.random(max(n, 1))[:n] < (1.0 if rng.random() < 0.5 else 0.9)
    ff = (npr.integers(-2048, 2048, max(n, 1))[:n] / 64.0).astype(np.float64)
    p = RelationTableProvider()
    p.add_table(
        "facts",
        Relation(
            ["k", "v", "f"],
            [
                Column(SType.UINT64, fk, np.ones(n, bool)),
                Column(SType.UINT64, np.where(fv_valid, fv, 0).astype(np.uint64),
                       fv_valid.copy()),
                Column(SType.FLOAT64, ff, np.ones(n, bool)),
            ],
            n,
        ),
    )
    p.add_table(
        "dims",
        Relation(
            ["k", "attr"],
            [
                Column(SType.UINT64, dk, np.ones(d, bool)),
                Column(SType.UINT64, dattr, np.ones(d, bool)),
            ],
            d,
        ),
    )
    return p


JOIN_AGGS = [
    "count(1)", "sum(facts.v)", "min(facts.v)", "max(facts.v)",
    "sum(facts.f)", "mean(facts.f)", "count(facts.v)",
]
JOIN_WHERES = ["facts.v < 500", "facts.f > 0.0", "facts.v % 3 = 0"]


def _gen_join_query(rng: random.Random) -> str:
    aggs = rng.sample(JOIN_AGGS, rng.randint(1, 3))
    jt = "join" if rng.random() < 0.8 else "left join"
    q = (
        f"select dims.attr, {', '.join(aggs)} from facts {jt} dims"
        f" on facts.k = dims.k"
    )
    if rng.random() < 0.5:
        q += " where " + rng.choice(JOIN_WHERES)
    q += " group by dims.attr"
    ordinals = ", ".join(str(i + 1) for i in range(1 + len(aggs)))
    return q + f" order by {ordinals};"


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_join_host_device_parity(seed):
    rng = random.Random(5000 + seed)
    provider = _make_join_tables(rng)
    query = _gen_join_query(rng)
    host = _run(provider, query, device=False)
    dev = _run(provider, query, device=True)
    assert host == dev, (
        f"seed={seed} query={query!r}\nhost={host[1][:8]}\ndev ={dev[1][:8]}"
    )


def test_fuzz_join_is_not_vacuous():
    """Enough join fuzz seeds must hit the device join route."""
    from eventql_tpu.exec.device_exec import try_execute_device_join_groupby
    import eventql_tpu.plan.nodes as qn

    prev = os.environ.get("EVENTQL_TPU_DEVICE")
    os.environ["EVENTQL_TPU_DEVICE"] = "1"
    try:
        hits = 0
        for s in range(20):
            rng = random.Random(5000 + s)
            provider = _make_join_tables(rng)
            query = _gen_join_query(rng)
            rt = Runtime()
            txn = rt.new_transaction(provider)
            node = rt.build_query_plan(txn, query).nodes[0]
            while not isinstance(node, qn.GroupByNode):
                node = node.table
            if try_execute_device_join_groupby(node, txn) is not None:
                hits += 1
        assert hits >= 10, f"only {hits}/20 join fuzz seeds device-routed"
    finally:
        if prev is None:
            os.environ.pop("EVENTQL_TPU_DEVICE", None)
        else:
            os.environ["EVENTQL_TPU_DEVICE"] = prev
