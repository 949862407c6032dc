"""sstable v3 round-trip tests (format: io/sstable/binaryformat.h:33-80;
row checksums FNV-1a-32 over sizes+key+data, RowWriter.cc:36-42)."""

import struct

import pytest

from eventql_tpu.columnar.sstable import (
    FLAG_FINALIZED,
    SSTableReader,
    SSTableWriter,
)
from eventql_tpu.core.errors import RuntimeError_


def test_roundtrip(tmp_path):
    path = str(tmp_path / "t.sst")
    w = SSTableWriter(path, userdata=b"meta")
    rows = [(f"k{i}".encode(), f"value-{i*i}".encode()) for i in range(100)]
    for k, v in rows:
        w.append(k, v)
    w.finalize()

    r = SSTableReader(path)
    assert r.finalized
    assert r.num_rows == 100
    assert r.userdata == b"meta"
    assert r.rows() == rows


def test_header_fields(tmp_path):
    path = str(tmp_path / "t.sst")
    w = SSTableWriter(path)
    w.append(b"a", b"b")
    w.finalize()
    raw = open(path, "rb").read()
    assert raw[:4] == b"\x17\x17\x17\x17"
    assert struct.unpack("<H", raw[4:6])[0] == 3
    assert struct.unpack("<Q", raw[6:14])[0] == FLAG_FINALIZED
    assert struct.unpack("<Q", raw[14:22])[0] == 1  # num_rows


def test_corrupt_row_detected(tmp_path):
    path = str(tmp_path / "t.sst")
    w = SSTableWriter(path)
    w.append(b"key", b"data")
    w.finalize()
    raw = bytearray(open(path, "rb").read())
    raw[-1] ^= 0xFF  # flip a data byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(RuntimeError_, match="row checksum"):
        SSTableReader(path).rows()


def test_mapreduce_spills_to_sstable(tmp_path):
    from eventql_tpu.db.table_service import TableService
    from eventql_tpu.exec.runtime import Runtime
    from eventql_tpu.mapreduce.service import MapReduceService

    svc = TableService()
    rt = Runtime()
    txn = rt.new_transaction(svc)
    rt.build_query_plan(
        txn, "CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));"
    ).execute(0)
    for i in range(10):
        svc.insert_json("ev", f'{{"t": {i}, "v": {i % 3}}}')

    mr = MapReduceService(svc, spill_dir=str(tmp_path / "mr"))
    job = {
        "jobs": {
            "m": {
                "op": "map_table",
                "table": "ev",
                "map_fn": "lambda row: [(row['v'], '1')]",
            },
            "r": {
                "op": "reduce",
                "sources": ["m"],
                "reduce_fn": (
                    "lambda key, values: [(key, str(sum(int(v) for v in"
                    " values)))]"
                ),
            },
            "out": {"op": "return_results", "sources": ["r"]},
        },
        "execute": ["out"],
    }
    (result,) = mr.execute(job)
    assert sorted(result) == [("0", "4"), ("1", "3"), ("2", "3")]
    import glob

    ssts = glob.glob(str(tmp_path / "mr" / "*.sst"))
    assert len(ssts) >= 3  # one result file per task
