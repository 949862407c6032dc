"""Server binary (reference: evqld.cc).

Starts the HTTP API server with a standalone in-process table service —
the TPU-native equivalent of `evqld --standalone`.
"""

from __future__ import annotations

import argparse
import signal
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="evqld", description="eventql_tpu server")
    ap.add_argument("--listen_http", default="127.0.0.1:9175")
    ap.add_argument("--standalone", action="store_true", default=True)
    ap.add_argument("--datadir", default=None, help="persist tables to this directory")
    args = ap.parse_args(argv)

    host, _, port = args.listen_http.partition(":")
    from eventql_tpu.server.http_api import EventQLServer

    table_service = None
    if args.datadir:
        from eventql_tpu.db.lsm import DurableTableService

        table_service = DurableTableService(args.datadir)

    server = EventQLServer(
        table_service=table_service,
        host=host or "127.0.0.1",
        port=int(port or 9175),
    )
    server.start()
    print(f"eventql_tpu server listening on http://{host}:{server.port}")

    stop = []
    signal.signal(signal.SIGINT, lambda *a: stop.append(1))
    signal.signal(signal.SIGTERM, lambda *a: stop.append(1))
    while not stop:
        time.sleep(0.2)
    if args.datadir:
        server.table_service.commit_all()
    server.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
