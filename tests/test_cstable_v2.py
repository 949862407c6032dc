"""cstable v0.2 round-trip tests (format: io/cstable/cstable.h:63-110 —
metablocks, page index, per-stream pages; column stream layouts from
io/cstable/columns/page_writer_*.cc)."""

import numpy as np
import pytest

from eventql_tpu.columnar.cstable import (
    STRING_PLAIN,
    UINT64_LEB128,
    CSTableReader,
)
from eventql_tpu.columnar.cstable_v2 import CSTableV2Writer, write_cstable_v2
from eventql_tpu.core.types import SType
from eventql_tpu.exec.relation import Column, Relation


def _mkrel(n=300, seed=7):
    rng = np.random.default_rng(seed)
    ints = rng.integers(0, 1 << 40, n).astype(np.uint64)
    ivalid = rng.random(n) > 0.2
    floats = rng.normal(size=n)
    fvalid = rng.random(n) > 0.1
    bools = rng.random(n) > 0.5
    words = [b"alpha", b"beta", b"gamma", b"", b"long-string-value-here"]
    svals = [words[i % 5] if i % 7 else None for i in range(n)]
    return Relation(
        ["u", "f", "b", "s"],
        [
            Column(SType.UINT64, np.where(ivalid, ints, 0), ivalid),
            Column(SType.FLOAT64, np.where(fvalid, floats, 0.0), fvalid),
            Column(SType.BOOL, bools, np.ones(n, bool)),
            Column.from_strings(svals),
        ],
        n,
    )


def test_v2_flat_roundtrip(tmp_path):
    rel = _mkrel()
    path = str(tmp_path / "t.cst")
    write_cstable_v2(path, rel, transaction_id=3)
    r = CSTableReader(path)
    assert r.num_rows == rel.num_rows
    assert r.transaction_id == 3
    back = r.to_relation()
    assert back.names == rel.names
    for name, orig in zip(rel.names, rel.columns):
        got = back.columns[back.names.index(name)]
        np.testing.assert_array_equal(got.valid, orig.valid)
        if orig.stype == SType.STRING:
            for i in range(rel.num_rows):
                assert got.value_at(i) == orig.value_at(i)
        elif orig.stype == SType.FLOAT64:
            np.testing.assert_allclose(
                got.data[got.valid], orig.data[orig.valid]
            )
        else:
            np.testing.assert_array_equal(got.data[got.valid], orig.data[orig.valid])


def test_v2_metablock_slots(tmp_path):
    # txid parity picks the slot; highest txid wins on read
    rel = _mkrel(50)
    path = str(tmp_path / "t.cst")
    write_cstable_v2(path, rel, transaction_id=2)  # slot 0
    r = CSTableReader(path)
    assert r.transaction_id == 2 and r.num_rows == 50


def test_v2_corrupt_metablock_rejected(tmp_path):
    rel = _mkrel(20)
    path = str(tmp_path / "t.cst")
    write_cstable_v2(path, rel)
    raw = bytearray(open(path, "rb").read())
    slot = 1 % 2  # txid=1 → slot 1 at offset 14+48
    raw[14 + 48 * slot + 5] ^= 0xFF  # flip a byte inside the metablock
    open(path, "wb").write(bytes(raw))
    from eventql_tpu.core.errors import RuntimeError_

    with pytest.raises(RuntimeError_):
        CSTableReader(path)


def test_v2_repeated_column_streams(tmp_path):
    """Repeated column: reader must cut the zero-padded level streams at
    the num_rows-th record boundary."""
    path = str(tmp_path / "rep.cst")
    w = CSTableV2Writer(path)
    w.add_column("tags", UINT64_LEB128, 1, 1)
    # 3 records: [10, 11], [], [12, 13, 14] → 6 level slots
    rlvls = [0, 1, 0, 0, 1, 1]
    dlvls = [1, 1, 0, 1, 1, 1]
    values = np.array([10, 11, 12, 13, 14], dtype=np.uint64)
    w.set_column_values("tags", rlvls, dlvls, values)
    w.commit(num_rows=3)

    r = CSTableReader(path)
    dec = r.decode_column("tags")
    np.testing.assert_array_equal(dec.rlvls, rlvls)
    np.testing.assert_array_equal(dec.dlvls, dlvls)
    np.testing.assert_array_equal(dec.values, values)


def test_v2_nested_scan_within_record(tmp_path):
    """WITHIN RECORD aggregation over a v0.2 nested column goes through
    the same Dremel assembly as v0.1."""
    from eventql_tpu.columnar.providers import CSTableScanProvider
    from eventql_tpu.exec.runtime import Runtime

    path = str(tmp_path / "nested.cst")
    w = CSTableV2Writer(path)
    w.add_column("id", UINT64_LEB128, 0, 0)
    w.set_column_values(
        "id", np.zeros(3, np.uint32), np.zeros(3, np.uint32),
        np.array([1, 2, 3], np.uint64),
    )
    w.add_column("xs.v", UINT64_LEB128, 1, 1)
    w.set_column_values(
        "xs.v", [0, 1, 0, 0, 1, 1], [1, 1, 0, 1, 1, 1],
        np.array([10, 11, 12, 13, 14], np.uint64),
    )
    w.commit(num_rows=3)

    provider = CSTableScanProvider("t", path)
    rt = Runtime()
    txn = rt.new_transaction(provider)
    plan = rt.build_query_plan(
        txn, "select id, sum(`xs.v`) WITHIN RECORD from t;"
    )
    result = plan.execute(0)
    assert result.rows == [["1", "21"], ["2", "0"], ["3", "39"]]


def test_lsm_segments_are_v2(tmp_path):
    from eventql_tpu.db.lsm import DurableTableService
    from eventql_tpu.exec.runtime import Runtime

    svc = DurableTableService(str(tmp_path))
    rt = Runtime()
    txn = rt.new_transaction(svc)
    plan = rt.build_query_plan(
        txn, "CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));"
    )
    plan.execute(0)
    for i in range(10):
        svc.insert_json("ev", f'{{"t": {i}, "v": {i*3}}}')
    svc.commit_all()
    import glob
    import os

    segs = glob.glob(os.path.join(str(tmp_path), "ev", "segment-*.cst"))
    assert segs
    raw = open(segs[0], "rb").read()
    assert raw[4] == 2  # v0.2 file version byte

    svc2 = DurableTableService(str(tmp_path))
    txn2 = rt.new_transaction(svc2)
    plan2 = rt.build_query_plan(txn2, "select sum(v) from ev;")
    assert plan2.execute(0).rows == [[str(sum(i * 3 for i in range(10)))]]
