"""Stats counters / statsd agent / background compaction tests
(reference: util/stats/statsdagent.cc wire behavior — "path:value"
lines batched under 48k per UDP packet; VALUE vs DELTA export modes;
db/compaction_worker.cc background compaction)."""

import socket
import time

from eventql_tpu.utils.stats import (
    Counter,
    ExportMode,
    StatsdAgent,
    StatsRepository,
)


def test_counter_ops():
    c = Counter()
    c.incr()
    c.incr(5)
    c.decr(2)
    assert c.get() == 4
    c.set(10)
    assert c.get() == 10


def _recv_lines(sock, timeout=5.0):
    sock.settimeout(timeout)
    data, _ = sock.recvfrom(65536)
    return data.decode().strip().splitlines()


def test_statsd_agent_value_and_delta():
    recv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    recv.bind(("127.0.0.1", 0))
    port = recv.getsockname()[1]

    repo = StatsRepository()
    gauge = Counter(7)
    rate = Counter(100)
    repo.export_stat("t.gauge", gauge, ExportMode.EXPORT_VALUE)
    repo.export_stat("t.rate", rate, ExportMode.EXPORT_DELTA)

    agent = StatsdAgent(("127.0.0.1", port), report_interval=60, stats_repo=repo)
    agent.report()
    lines = _recv_lines(recv)
    assert "t.gauge:7" in lines
    assert "t.rate:100" in lines  # first delta = full value

    rate.incr(23)
    agent.report()
    lines = _recv_lines(recv)
    assert "t.gauge:7" in lines
    assert "t.rate:23" in lines  # delta since last report
    recv.close()
    agent._sock.close()


def test_statsd_packet_batching():
    recv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    recv.bind(("127.0.0.1", 0))
    port = recv.getsockname()[1]

    repo = StatsRepository()
    for i in range(3000):
        repo.export_stat(f"metric.with.a.rather.long.path.{i:06d}", Counter(i))
    agent = StatsdAgent(("127.0.0.1", port), report_interval=60, stats_repo=repo)
    agent.report()
    # >48k of lines must split across multiple packets
    pkts = []
    recv.settimeout(2.0)
    try:
        while True:
            data, _ = recv.recvfrom(65536)
            pkts.append(data)
    except socket.timeout:
        pass
    assert len(pkts) >= 2
    assert all(len(p) < StatsdAgent.MAX_PACKET_SIZE for p in pkts)
    total_lines = sum(p.decode().strip().count("\n") + 1 for p in pkts)
    assert total_lines == 3000
    recv.close()
    agent._sock.close()


def test_background_compaction(tmp_path):
    from eventql_tpu.db.lsm import DurableTableService
    from eventql_tpu.exec.runtime import Runtime

    svc = DurableTableService(str(tmp_path), arena_flush_rows=4)
    svc.COMPACT_SEGMENT_THRESHOLD = 3
    rt = Runtime()
    txn = rt.new_transaction(svc)
    rt.build_query_plan(
        txn, "CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));"
    ).execute(0)
    for i in range(40):  # 10 segments of 4 rows
        svc.insert_json("ev", f'{{"t": {i}, "v": {i}}}')
    table = svc.tables["ev"]
    assert len(table._segments) >= 3

    svc.start_compaction_worker(interval=0.1)
    deadline = time.time() + 10
    while time.time() < deadline and len(table._segments) > 1:
        time.sleep(0.05)
    svc.stop_compaction_worker()
    assert len(table._segments) <= 1

    txn = rt.new_transaction(svc)
    plan = rt.build_query_plan(txn, "select count(1), sum(v) from ev;")
    assert plan.execute(0).rows == [["40", str(sum(range(40)))]]
