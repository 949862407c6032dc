"""Distributed MapReduce: shards execute on the cluster nodes that own
the partitions.

Reference behavior under test (mapreduce/tasks/map_table.cc,
tasks/reduce.cc, transport/http/mapreduce_servlet.cc,
mapreduce_service.cc):
  * map shards run on a partition replica via
    POST /api/v1/mapreduce/tasks/map_partition (SSE result_id), with a
    cache-only first round, content-addressed mr-shard-<id>.sst caching
    and per-replica failover;
  * reduce shards pull their inputs from the map servers' result caches
    through GET /api/v1/mapreduce/result/<id>?sample=<mod>:<idx>
    ([u32 klen][u32 vlen][key][val]...[0][0] framing, FNV64 key split);
  * save_to_table stores a result on the cluster through the
    partition-aware insert path.
"""

import json
import os
import struct
import urllib.request
from urllib.parse import unquote, urlencode

import pytest

from eventql_tpu.config.config_directory import (
    SERVER_DOWN,
    SERVER_UP,
    ConfigDirectory,
    ServerConfig,
)
from eventql_tpu.db.metadata import TableMetadata
from eventql_tpu.db.table_service import TableService
from eventql_tpu.exec.runtime import Runtime
from eventql_tpu.parallel.cluster import cluster_provider_from_config
from eventql_tpu.server.http_api import EventQLServer
from eventql_tpu.server.listener import Listener
from eventql_tpu.server.native_tcp import NativeTCPServer


@pytest.fixture
def http_cluster(tmp_path):
    """3 nodes, each serving HTTP+native on one sniffed port (the evqld
    wiring: Listener routes '^' to the native transport); replication
    factor 2."""
    cfg = str(tmp_path / "cluster.json")
    cdir = ConfigDirectory(cfg)
    cdir.cluster_create("test", replication_factor=2)
    nodes = []
    for i in range(3):
        svc = TableService()
        cachedir = str(tmp_path / f"cache{i + 1}")
        http = EventQLServer(
            table_service=svc,
            query_provider_factory=lambda: cluster_provider_from_config(cfg),
            mr_cachedir=cachedir,
        )
        http.start(bind=False)
        native = NativeTCPServer(
            svc,
            port=0,
            query_provider_factory=lambda: cluster_provider_from_config(cfg),
        ).start()
        listener = Listener(http, native, port=0).start()
        cdir.update_server_config(
            ServerConfig(
                f"node{i + 1}", f"127.0.0.1:{listener.port}", SERVER_UP
            )
        )
        nodes.append(
            {
                "svc": svc,
                "http": http,
                "native": native,
                "listener": listener,
                "cachedir": cachedir,
                "id": f"node{i + 1}",
            }
        )
    yield cfg, cdir, nodes
    for n in nodes:
        n["listener"].stop()
        n["native"].stop()
        n["http"].stop()


def _setup_split_table(cfg, cdir, rows=24):
    """Create a table, split it into two partitions, insert rows."""
    p = cluster_provider_from_config(cfg)
    rt = Runtime()
    txn = rt.new_transaction(p)
    rt.build_query_plan(
        txn, "CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));"
    ).execute(0)
    meta = TableMetadata.from_json(
        cdir.get_table_config("default", "ev")["metadata"]
    )
    meta.split(meta.entries[0].partition_id, rows // 2)
    cdir.update_table_config("default", "ev", {"metadata": meta.to_json()})
    p2 = cluster_provider_from_config(cfg)
    for i in range(rows):
        p2.insert_json("ev", json.dumps({"t": i, "v": i % 5}))
    p.close()
    p2.close()
    return TableMetadata.from_json(
        cdir.get_table_config("default", "ev")["metadata"]
    )


MAP_FN = "lambda row: [(str(row['v']), '1')]"
REDUCE_FN = (
    "def r(key, values):\n"
    "    return [(key, str(sum(int(v) for v in values)))]\n"
)
JOB = {
    "jobs": {
        "m": {"op": "map_table", "table": "ev", "map_fn": MAP_FN},
        "r": {
            "op": "reduce",
            "sources": ["m"],
            "reduce_fn": REDUCE_FN,
            "num_shards": 2,
        },
        "out": {"op": "return_results", "sources": ["r"]},
    },
    "execute": ["out"],
}


def _post_json(addr, path, payload):
    req = urllib.request.Request(
        f"http://{addr}{path}",
        data=json.dumps(payload).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, json.loads(resp.read().decode())


def _addr(node):
    return f"127.0.0.1:{node['listener'].port}"


def test_distributed_job_runs_on_data_nodes(http_cluster):
    cfg, cdir, nodes = http_cluster
    meta = _setup_split_table(cfg, cdir)
    assert len(meta.entries) == 2

    status, out = _post_json(
        _addr(nodes[0]), "/api/v1/mapreduce/execute", JOB
    )
    assert status == 200
    got = {r["key"]: int(r["value"]) for r in out["results"][0]}
    # 24 rows, v = i % 5 → keys 0..4
    exp = {}
    for i in range(24):
        exp[str(i % 5)] = exp.get(str(i % 5), 0) + 1
    assert got == exp


def test_map_shards_execute_on_partition_owners(http_cluster):
    """A map-only job caches its result sstables on the data nodes and
    nowhere else (reduce outputs may land anywhere, so locality is
    asserted without a reduce stage)."""
    cfg, cdir, nodes = http_cluster
    meta = _setup_split_table(cfg, cdir)
    job = {
        "jobs": {
            "m": {"op": "map_table", "table": "ev", "map_fn": MAP_FN},
            "out": {"op": "return_results", "sources": ["m"]},
        },
        "execute": ["out"],
    }
    status, out = _post_json(_addr(nodes[0]), "/api/v1/mapreduce/execute", job)
    assert status == 200
    assert len(out["results"][0]) == 24  # one pair per row, pre-reduce

    owners = set()
    for e in meta.entries:
        owners.update(e.servers)
    cached_on = set()
    for n in nodes:
        if os.path.isdir(n["cachedir"]) and any(
            f.startswith("mr-shard-") and "~" not in f
            for f in os.listdir(n["cachedir"])
        ):
            cached_on.add(n["id"])
    assert cached_on  # the shards really spilled somewhere
    assert cached_on <= owners  # ...and only on data nodes


def test_map_results_cached_across_runs(http_cluster):
    cfg, cdir, nodes = http_cluster
    _setup_split_table(cfg, cdir)
    _post_json(_addr(nodes[0]), "/api/v1/mapreduce/execute", JOB)

    def shard_files():
        out = {}
        for n in nodes:
            if os.path.isdir(n["cachedir"]):
                out[n["id"]] = {
                    f: os.path.getmtime(os.path.join(n["cachedir"], f))
                    for f in os.listdir(n["cachedir"])
                    if f.startswith("mr-shard-") and "~" not in f
                }
        return out

    before = shard_files()
    # second run: cache-only round hits, nothing re-executes
    status, out = _post_json(
        _addr(nodes[0]), "/api/v1/mapreduce/execute", JOB
    )
    assert status == 200
    assert shard_files() == before


def test_result_endpoint_framing_and_sampling(http_cluster):
    cfg, cdir, nodes = http_cluster
    _setup_split_table(cfg, cdir)
    # execute one map shard directly on an owner
    meta = TableMetadata.from_json(
        cdir.get_table_config("default", "ev")["metadata"]
    )
    entry = meta.entries[0]
    owner = next(n for n in nodes if n["id"] == entry.servers[0])
    body = urlencode(
        [
            ("table", "ev"),
            ("partition", entry.partition_id),
            ("map_function", MAP_FN),
        ]
    ).encode()
    req = urllib.request.Request(
        f"http://{_addr(owner)}/api/v1/mapreduce/tasks/map_partition",
        data=body,
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        text = resp.read().decode()
    rid = None
    for block in text.split("\n\n"):
        if "event: result_id" in block:
            rid = block.split("data:")[1].strip()
    assert rid

    def fetch(sample=None):
        url = f"http://{_addr(owner)}/api/v1/mapreduce/result/{rid}"
        if sample:
            url += f"?sample={sample}"
        with urllib.request.urlopen(url, timeout=60) as resp:
            assert resp.headers["Content-Type"] == "application/octet-stream"
            raw = resp.read()
        pairs = []
        off = 0
        saw_eos = False
        while off < len(raw):
            klen, vlen = struct.unpack_from("<II", raw, off)
            off += 8
            if klen == 0 and vlen == 0:
                saw_eos = True
                continue
            pairs.append(
                (raw[off : off + klen].decode(),
                 raw[off + klen : off + klen + vlen].decode())
            )
            off += klen + vlen
        assert saw_eos
        return pairs

    full = fetch()
    assert len(full) == 12  # half the 24 rows live in partition 0
    s0, s1 = fetch("2:0"), fetch("2:1")
    assert sorted(s0 + s1) == sorted(full)
    # FNV64 split is by key: the same key never lands in both shards
    assert not ({k for k, _ in s0} & {k for k, _ in s1})

    # unknown result id → 404
    try:
        urllib.request.urlopen(
            f"http://{_addr(owner)}/api/v1/mapreduce/result/{'0' * 40}",
            timeout=60,
        )
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 404
    assert raised


def test_save_to_table_routes_through_cluster(http_cluster):
    cfg, cdir, nodes = http_cluster
    _setup_split_table(cfg, cdir)
    job = {
        "jobs": {
            "m": {"op": "map_table", "table": "ev", "map_fn": MAP_FN},
            "r": {
                "op": "reduce",
                "sources": ["m"],
                "reduce_fn": REDUCE_FN,
                "num_shards": 1,
            },
            "save": {
                "op": "save_to_table",
                "sources": ["r"],
                "table": "mr_out",
            },
        },
        "execute": ["save"],
    }
    status, _ = _post_json(_addr(nodes[0]), "/api/v1/mapreduce/execute", job)
    assert status == 200

    p = cluster_provider_from_config(cfg)
    rt = Runtime()
    txn = rt.new_transaction(p)
    rows = rt.build_query_plan(
        txn, "select `key`, `value` from mr_out order by `key`;"
    ).execute(0).rows
    assert rows == [[str(k), str(5 if k < 4 else 4)] for k in range(5)]
    p.close()


def test_map_shard_failover_to_replica(http_cluster):
    cfg, cdir, nodes = http_cluster
    meta = _setup_split_table(cfg, cdir)
    # stop the FIRST replica of every partition and mark it down
    first_owners = {e.servers[0] for e in meta.entries}
    for n in nodes:
        if n["id"] in first_owners:
            n["listener"].stop()
            n["native"].stop()
            cdir.update_server_config(
                ServerConfig(n["id"], f"127.0.0.1:1", SERVER_DOWN)
            )
    coordinator = next(n for n in nodes if n["id"] not in first_owners)
    status, out = _post_json(
        _addr(coordinator), "/api/v1/mapreduce/execute", JOB
    )
    assert status == 200
    got = {r["key"]: int(r["value"]) for r in out["results"][0]}
    exp = {}
    for i in range(24):
        exp[str(i % 5)] = exp.get(str(i % 5), 0) + 1
    assert got == exp


def test_js_program_distributed_sse(http_cluster):
    """A JavaScript job program fans map shards across the cluster
    (reference: executeMapReduceScript + MapTableTask)."""
    cfg, cdir, nodes = http_cluster
    _setup_split_table(cfg, cdir)
    program = """
var mapped = EVQL.mapTable({
  table: "ev",
  map_fn: function(row) { return [[row.v, 1]]; }
});
var reduced = EVQL.reduce({
  sources: [mapped],
  shards: 2,
  reduce_fn: function(key, values) {
    var sum = 0;
    while (values.hasNext()) { sum += Number(values.next()); }
    return [[key, sum]];
  }
});
EVQL.downloadResults([reduced]);
"""
    req = urllib.request.Request(
        f"http://{_addr(nodes[0])}/api/v1/mapreduce/execute",
        data=program.encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        text = resp.read().decode()
    events = []
    for block in text.split("\n\n"):
        lines = block.strip().split("\n")
        if len(lines) >= 2 and lines[0].startswith("event:"):
            events.append(
                (lines[0][6:].strip(),
                 "\n".join(ln[5:].lstrip() for ln in lines[1:])),
            )
    names = [e for e, _ in events]
    assert names[0] == "job_started"
    assert names[-1] == "job_finished"
    results = [json.loads(unquote(d)) for e, d in events if e == "result"]
    got = {r["key"]: int(json.loads(r["value"])) for r in results}
    exp = {}
    for i in range(24):
        exp[str(i % 5)] = exp.get(str(i % 5), 0) + 1
    assert got == exp
