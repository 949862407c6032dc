"""evqlctl + standalone config directory + multi-process cluster tests
(reference: evqlctl.cc command set, cli/commands/*; the cluster
registry is the standalone analog of ConfigDirectory,
config/config_directory.h)."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

from eventql_tpu.config.config_directory import (
    SERVER_UP,
    ConfigDirectory,
    ServerConfig,
)
from eventql_tpu.core.errors import RuntimeError_


def ctl(tmp_path, *argv):
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "eventql_tpu.cli.evqlctl",
            "-C",
            str(tmp_path / "cluster.json"),
            *argv,
        ],
        capture_output=True,
        text=True,
        timeout=60,
    )
    return out


def test_config_directory_ops(tmp_path):
    cdir = ConfigDirectory(str(tmp_path / "c.json"))
    cdir.cluster_create("prod")
    assert cdir.get_cluster_config()["name"] == "prod"
    with pytest.raises(RuntimeError_):
        cdir.cluster_create("prod")
    cdir.update_server_config(
        ServerConfig("node1", "127.0.0.1:9176", SERVER_UP)
    )
    cdir.update_server_config(ServerConfig("node2", "127.0.0.1:9276"))
    assert [s.server_id for s in cdir.list_servers()] == ["node1", "node2"]
    assert cdir.worker_addrs() == [("127.0.0.1", 9176)]  # only UP servers
    cdir.remove_server("node2")
    assert len(cdir.list_servers()) == 1
    cdir.create_namespace("mydb")
    cdir.update_table_config("mydb", "ev", {"disable_split": "true"})
    assert cdir.get_table_config("mydb", "ev") == {"disable_split": "true"}


def test_evqlctl_cluster_commands(tmp_path):
    assert ctl(tmp_path, "cluster-create").returncode == 0
    assert (
        ctl(tmp_path, "cluster-add-server", "--server_name", "n1").returncode
        == 0
    )
    out = ctl(tmp_path, "cluster-list")
    assert out.returncode == 0
    assert "n1" in out.stdout and "SERVER_DOWN" in out.stdout
    assert (
        ctl(tmp_path, "cluster-remove-server", "--server_name", "n1").returncode
        == 0
    )
    out = ctl(tmp_path, "cluster-remove-server", "--server_name", "n1")
    assert out.returncode == 1 and "server not found" in out.stderr


def test_evqlctl_cluster_status_pings_live_server(tmp_path):
    from eventql_tpu.db.table_service import TableService
    from eventql_tpu.server.native_tcp import NativeTCPServer

    server = NativeTCPServer(TableService(), port=0).start()
    try:
        ctl(tmp_path, "cluster-create")
        ctl(
            tmp_path,
            "cluster-add-server",
            "--server_name",
            "live",
            "--server_addr",
            f"127.0.0.1:{server.port}",
        )
        ctl(
            tmp_path,
            "cluster-add-server",
            "--server_name",
            "dead",
            "--server_addr",
            "127.0.0.1:1",
        )
        out = ctl(tmp_path, "cluster-status")
        assert out.returncode == 0
        lines = {l.split()[0]: l for l in out.stdout.splitlines() if l}
        assert "SERVER_UP" in lines["live"]
        assert "SERVER_DOWN" in lines["dead"]
    finally:
        server.stop()


def test_evqlctl_table_import(tmp_path):
    from eventql_tpu.db.table_service import TableService
    from eventql_tpu.server.native_tcp import NativeTCPClient, NativeTCPServer

    server = NativeTCPServer(TableService(), port=0).start()
    try:
        c = NativeTCPClient("127.0.0.1", server.port)
        c.query("CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));")
        c.close()
        data = tmp_path / "rows.json"
        data.write_text(
            "\n".join(json.dumps({"t": i, "v": i * 10}) for i in range(200))
        )
        out = ctl(
            tmp_path,
            "table-import",
            "--host",
            "127.0.0.1",
            "--port",
            str(server.port),
            "--table_name",
            "ev",
            str(data),
        )
        assert out.returncode == 0, out.stderr
        assert "imported 200 records" in out.stdout
        c = NativeTCPClient("127.0.0.1", server.port)
        results = c.query("select count(1), sum(v) from ev;")
        c.close()
        assert results[0][1] == [["200", str(sum(i * 10 for i in range(200)))]]
    finally:
        server.stop()


def test_two_node_evqld_cluster(tmp_path):
    """Boot two evqld processes joined through the registry; inserts land
    on each node locally, a query against either fans out and merges."""
    from eventql_tpu.server.native_tcp import NativeTCPClient

    cfg = str(tmp_path / "cluster.json")
    procs = []
    try:
        for i, (hp, np_) in enumerate([(29175, 29176), (29275, 29276)]):
            procs.append(
                subprocess.Popen(
                    [
                        sys.executable,
                        "-m",
                        "eventql_tpu.cli.evqld",
                        "--listen_http",
                        f"127.0.0.1:{hp}",
                        "--listen_native",
                        f"127.0.0.1:{np_}",
                        "--config_dir",
                        cfg,
                        "--server_name",
                        f"node{i+1}",
                    ],
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    cwd=os.path.dirname(os.path.dirname(__file__)),
                )
            )
        # wait for both registrations
        deadline = time.time() + 30
        cdir = ConfigDirectory(cfg)
        while time.time() < deadline:
            if len(cdir.worker_addrs()) == 2:
                break
            time.sleep(0.2)
        assert len(cdir.worker_addrs()) == 2

        # create the table cluster-wide (broadcast), insert locally per node
        c1 = NativeTCPClient("127.0.0.1", 29176)
        c1.query("CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));")
        c1.insert_json("ev", ['{"t": 1, "v": 100}', '{"t": 2, "v": 200}'])
        c2 = NativeTCPClient("127.0.0.1", 29276)
        c2.insert_json("ev", ['{"t": 3, "v": 700}'])

        # query via node1: must see node2's rows too
        results = c1.query("select count(1), sum(v) from ev;")
        assert results[0][1] == [["3", "1000"]]
        # and via node2
        results = c2.query("select count(1), sum(v) from ev;")
        assert results[0][1] == [["3", "1000"]]

        # cluster show servers reflects both live nodes
        results = c1.query("cluster show servers;")
        statuses = [row[1] for row in results[0][1]]
        assert statuses == ["SERVER_UP", "SERVER_UP"]
        c1.close()
        c2.close()
    finally:
        for p in procs:
            p.send_signal(signal.SIGTERM)
        for p in procs:
            try:
                p.wait(timeout=15)
            except subprocess.TimeoutExpired:
                p.kill()
