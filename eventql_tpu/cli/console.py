"""Interactive SQL console (reference: cli/console.cc + evql.cc).

Runs queries against a local embedded runtime or a remote HTTP server
and renders ASCII result tables like the reference's console codec
(reference: server/sql/codec/ascii_codec.cc)."""

from __future__ import annotations

import argparse
import json
import sys
import urllib.request
from typing import List, Optional


def render_ascii_table(columns: List[str], rows: List[List[str]]) -> str:
    # reference: ASCIICodec table rendering — +--+ borders, padded cells
    widths = [len(c) for c in columns]
    for row in rows:
        for i, cell in enumerate(row):
            widths[i] = max(widths[i], len(cell))

    def sep():
        return "+" + "+".join("-" * (w + 2) for w in widths) + "+"

    def fmt_row(cells):
        return (
            "|"
            + "|".join(
                " " + c.ljust(w) + " " for c, w in zip(cells, widths)
            )
            + "|"
        )

    out = [sep(), fmt_row(columns), sep()]
    for row in rows:
        out.append(fmt_row(row))
    out.append(sep())
    return "\n".join(out)


class LocalBackend:
    def __init__(self):
        from eventql_tpu.db.table_service import TableService
        from eventql_tpu.exec.runtime import Runtime

        self.runtime = Runtime()
        self.tables = TableService()

    def execute(self, query: str):
        txn = self.runtime.new_transaction(self.tables)
        plan = self.runtime.build_query_plan(txn, query)
        return [plan.execute(i) for i in range(plan.num_queries)]


class HTTPBackend:
    def __init__(self, host: str, port: int):
        self.url = f"http://{host}:{port}/api/v1/sql"

    def execute(self, query: str):
        from eventql_tpu.exec.result import ResultList

        req = urllib.request.Request(
            self.url,
            data=json.dumps({"query": query}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req) as resp:
                payload = json.loads(resp.read())
        except urllib.error.HTTPError as e:
            payload = json.loads(e.read())
        if "error" in payload:
            from eventql_tpu.core.errors import RuntimeError_

            raise RuntimeError_(payload["error"])
        return [
            ResultList(r["columns"], r["rows"]) for r in payload["results"]
        ]


def main(argv=None):
    ap = argparse.ArgumentParser(prog="evql", description="eventql_tpu SQL console")
    ap.add_argument("-h2", "--host", default=None, help="server host")
    ap.add_argument("-p", "--port", type=int, default=9175)
    ap.add_argument("-e", "--exec", dest="execute", default=None, help="run one query and exit")
    args = ap.parse_args(argv)

    backend = (
        HTTPBackend(args.host, args.port) if args.host else LocalBackend()
    )

    def run_one(q: str) -> int:
        from eventql_tpu.core.errors import SQLError

        try:
            for result in backend.execute(q):
                print(render_ascii_table(result.columns, result.rows))
                print(f"{result.num_rows} row(s)")
        except SQLError as e:
            print(f"ERROR: {e.message}", file=sys.stderr)
            return 1
        return 0

    if args.execute:
        sys.exit(run_one(args.execute))

    try:
        import readline  # noqa: F401 — line editing
    except ImportError:
        pass

    print("eventql_tpu console — end statements with ';', ctrl-d to exit")
    buf = ""
    while True:
        try:
            prompt = "evql> " if not buf else "   -> "
            line = input(prompt)
        except EOFError:
            print()
            break
        except KeyboardInterrupt:
            buf = ""
            print()
            continue
        buf += line + "\n"
        if line.rstrip().endswith(";"):
            run_one(buf)
            buf = ""


if __name__ == "__main__":
    main()
