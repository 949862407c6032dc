"""cstable writer round-trip tests."""

import numpy as np

from eventql_tpu.columnar.cstable import CSTableReader
from eventql_tpu.columnar.cstable_writer import write_cstable, simdbp128_pack
from eventql_tpu.columnar.cstable import simdbp128_unpack
from eventql_tpu.core.types import SType
from eventql_tpu.exec.relation import Column, Relation


def test_simdbp128_pack_roundtrip():
    rng = np.random.default_rng(0)
    for maxbits in (1, 2, 5, 9, 17, 31):
        n = 517
        vals = rng.integers(0, 1 << maxbits, n).astype(np.uint64)
        buf = simdbp128_pack(vals, maxbits)
        got = simdbp128_unpack(buf, n, maxbits)
        assert (got == vals.astype(np.uint32)).all()


def test_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    n = 300
    u = rng.integers(0, 2**60, n).astype(np.uint64)
    uv = rng.random(n) < 0.8
    f = rng.standard_normal(n)
    b = rng.random(n) < 0.5
    strs = [f"s{i % 17}".encode() if i % 5 else None for i in range(n)]

    rel = Relation(
        ["u", "f", "b", "s"],
        [
            Column(SType.UINT64, np.where(uv, u, 0).astype(np.uint64), uv),
            Column(SType.FLOAT64, f, np.ones(n, bool)),
            Column(SType.BOOL, b, np.ones(n, bool)),
            Column.from_strings(strs),
        ],
        n,
    )

    path = str(tmp_path / "test.cst")
    write_cstable(path, rel)

    reader = CSTableReader(path)
    assert reader.num_rows == n
    # columns come back sorted by name (reference v0.1 behavior)
    assert [c.name for c in reader.columns] == ["b", "f", "s", "u"]

    cu = reader.flat_column("u")
    assert (cu.valid == uv).all()
    assert (cu.data[uv] == u[uv]).all()

    cf = reader.flat_column("f")
    assert np.allclose(cf.data, f)

    cb = reader.flat_column("b")
    assert (cb.data == b).all()

    cs = reader.flat_column("s")
    got = [
        bytes(cs.dictionary[cs.data[i]]) if cs.valid[i] else None
        for i in range(n)
    ]
    assert got == strs


def test_query_over_written_cstable(tmp_path):
    from eventql_tpu.columnar.providers import CSTableScanProvider
    from eventql_tpu.exec.runtime import Runtime

    n = 100
    rel = Relation(
        ["k", "v"],
        [
            Column(
                SType.UINT64,
                (np.arange(n) % 4).astype(np.uint64),
                np.ones(n, bool),
            ),
            Column(SType.UINT64, np.arange(n).astype(np.uint64), np.ones(n, bool)),
        ],
        n,
    )
    path = str(tmp_path / "t.cst")
    write_cstable(path, rel)

    rt = Runtime()
    txn = rt.new_transaction(CSTableScanProvider("t", path))
    r = rt.build_query_plan(
        txn, "select k, sum(v), count(1) from t group by k order by k;"
    ).execute(0)
    assert r.num_rows == 4
    assert r.get_row(0) == ["0", str(sum(range(0, 100, 4))), "25"]
