"""System tests in the reference's automation style: spawn the real
server binary as a subprocess and drive it through public interfaces
(reference: test/automate/cluster.cc:34-52 startStandaloneCluster,
test/system/basic_sql/)."""

import json
import os
import subprocess
import sys
import time
import urllib.request

import pytest


@pytest.fixture(scope="module")
def server_proc():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "-m", "eventql_tpu.cli.evqld", "--listen_http", "127.0.0.1:19175"],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        env=env,
        cwd="/root/repo",
    )
    # wait for readiness
    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            urllib.request.urlopen("http://127.0.0.1:19175/eventql/stats", timeout=1)
            break
        except Exception:
            if proc.poll() is not None:
                out = proc.stdout.read().decode()
                raise RuntimeError(f"server died: {out}")
            time.sleep(0.2)
    else:
        proc.kill()
        raise RuntimeError("server did not become ready")
    yield proc
    proc.terminate()
    proc.wait(timeout=10)


def _sql(query):
    req = urllib.request.Request(
        "http://127.0.0.1:19175/api/v1/sql",
        data=json.dumps({"query": query}).encode(),
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def test_basic_sql_system(server_proc):
    # reference: test/system/basic_sql — create, insert, query back
    _sql(
        "CREATE TABLE customers (customerid uint64, customername string,"
        " PRIMARY KEY (customerid));"
    )
    _sql("INSERT INTO customers (customerid, customername) VALUES (1, 'Alfred');")
    _sql("INSERT INTO customers (customerid, customername) VALUES (2, 'Ana');")
    out = _sql("select customername from customers order by customerid;")
    assert out["results"][0]["rows"] == [["Alfred"], ["Ana"]]


def test_console_against_server(server_proc):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "eventql_tpu.cli.console",
            "--host",
            "127.0.0.1",
            "-p",
            "19175",
            "-e",
            "select count(1) cnt from customers;",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd="/root/repo",
        timeout=60,
    )
    assert "cnt" in out.stdout
    assert "| 2" in out.stdout


def test_console_batch_and_file(tmp_path):
    """Reference console flags: -f file execution, -B batch output,
    --output_file (evql.cc:103-229)."""
    import subprocess
    import sys

    sql = tmp_path / "q.sql"
    sql.write_text(
        "CREATE TABLE ev (t uint64, v uint64, PRIMARY KEY (t));\n"
        "INSERT INTO ev (t, v) VALUES (1, 10);\n"
        "INSERT INTO ev (t, v) VALUES (2, 32);\n"
        "select t, v from ev order by t;\n"
    )
    outf = tmp_path / "out.txt"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "eventql_tpu.cli.console",
            "-B",
            "-q",
            "-f",
            str(sql),
            "--output_file",
            str(outf),
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr
    lines = [l for l in outf.read_text().splitlines() if l]
    assert lines[-3:] == ["t\tv", "1\t10", "2\t32"]


def test_evqlbench_local_sql():
    """evqlbench local-sql smoke (reference: cli/benchmarks/local_sql.cc
    — repeated embedded query, rows/s report)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "eventql_tpu.cli.evqlbench",
            "local-sql",
            "-n",
            "2",
            "--rows",
            "10000",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd="/root/repo",
        timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert "rows/s" in r.stdout or "rows/s" in r.stderr


def test_evqlslap_query_mode(server_proc):
    """evqlslap smoke (reference: evqlslap.cc — threaded load gen with
    rolling RPS/latency stats against a live server)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "eventql_tpu.cli.evqlslap",
            "-p",
            "19175",
            "-t",
            "2",
            "-d",
            "1.5",
            "-q",
            "select 1;",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd="/root/repo",
        timeout=60,
    )
    assert r.returncode == 0, r.stderr
    out = r.stdout + r.stderr
    assert "rps" in out.lower() or "requests" in out.lower(), out
