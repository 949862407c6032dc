"""Replication repair: anti-entropy catch-up for replicas that missed
writes.

The reference's ReplicationWorker pushes partition data from hosting
nodes to lagging replicas in the background
(reference: db/replication_worker.cc — per-partition repl queues,
db/partition_replication.cc computes what a replica is missing). This
is the pull-side analog suited to our synchronous-majority write path:
each node periodically diffs its primary keys against the other
replicas of every partition it hosts and pulls the records it missed.
Together with newest-wins upserts this converges replicas without
coordination.
"""

from __future__ import annotations

import json
import threading
from typing import List, Optional, Tuple

from eventql_tpu.core.errors import RuntimeError_, SQLError


class ReplicationWorker:
    def __init__(
        self,
        table_service,
        config_dir_path: str,
        server_name: str,
        interval: float = 10.0,
    ):
        self.table_service = table_service
        self.config_dir_path = config_dir_path
        self.server_name = server_name
        self.interval = interval
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=self.interval + 5)

    def _run(self):
        while not self._stop.wait(self.interval):
            try:
                self.repair_once()
            except Exception:
                pass  # transient cluster errors; retry next sweep

    # -- one repair sweep ------------------------------------------------
    def repair_once(self) -> int:
        """Pull missed records from peer replicas; returns the number of
        records repaired."""
        from eventql_tpu.config.config_directory import SERVER_UP, ConfigDirectory
        from eventql_tpu.db.metadata import TableMetadata
        from eventql_tpu.server.native_tcp import NativeTCPClient

        cdir = ConfigDirectory(self.config_dir_path)
        addr_of = {}
        for s in cdir.list_servers():
            if s.server_status == SERVER_UP and s.server_addr:
                host, _, port = s.server_addr.rpartition(":")
                addr_of[s.server_id] = (host or "127.0.0.1", int(port))

        repaired = 0
        for info in self.table_service.list_tables() or []:
            table_name = info.table_name
            # nested tables reconstruct through the shredded path, which
            # the flat QUERY_REMOTE pull would lose — skip for now
            t = getattr(self.table_service, "tables", {}).get(table_name)
            if t is not None and getattr(t, "has_repeated", False):
                continue
            cfg = cdir.get_table_config("default", table_name)
            if not cfg or "metadata" not in cfg:
                continue
            meta = TableMetadata.from_json(cfg["metadata"])
            pk = meta.partition_key

            for entry in meta.entries:
                if self.server_name not in entry.servers:
                    continue
                peers = [
                    sid
                    for sid in entry.servers
                    if sid != self.server_name and sid in addr_of
                ]
                if not peers:
                    continue
                begin, end = meta.keyrange(entry.partition_id)
                local_keys = self._local_pk_set(table_name, pk, begin, end)

                for sid in peers:
                    try:
                        client = NativeTCPClient(*addr_of[sid])
                    except (OSError, ConnectionError):
                        continue
                    try:
                        repaired += self._pull_missing(
                            client, table_name, info, pk,
                            begin, end, local_keys,
                        )
                    except (OSError, SQLError, ConnectionError):
                        pass
                    finally:
                        client.close()
        return repaired

    def _local_pk_set(self, table_name, pk, begin, end):
        rel = self.table_service.get_table_data(table_name)
        idx = rel.names.index(pk)
        col = rel.columns[idx]
        out = set()
        for i in range(rel.num_rows):
            v = col.value_at(i)
            if not v.is_null:
                out.add(self._norm(v.payload()))
        return out

    @staticmethod
    def _norm(v):
        if isinstance(v, bytes):
            return v.decode("utf-8", errors="surrogateescape")
        return v

    def _pull_missing(
        self, client, table_name, info, pk, begin, end, local_keys
    ) -> int:
        """Fetch the peer's rows in this keyrange (QUERY_REMOTE) and
        insert the ones whose primary key is absent locally."""
        from eventql_tpu.parallel.cluster import relation_from_bytes
        from eventql_tpu.plan import nodes as qn
        from eventql_tpu.plan.coder import encode_plan
        from eventql_tpu.plan.exprs import ColumnReferenceNode

        scan = qn.SequentialScanNode(table_name, info.columns)
        for i, (cname, ctype) in enumerate(info.columns):
            scan.input_columns.append((cname, ctype))
            scan.select_list.append(
                qn.SelectListEntry(ColumnReferenceNode(cname, ctype, i), cname)
            )
        scan.output_columns = [c[0] for c in info.columns]
        scan.keyrange = (pk, begin, end)
        rel = relation_from_bytes(client.query_remote(encode_plan(scan)))

        pk_idx = rel.names.index(pk)
        n_repaired = 0
        for r in range(rel.num_rows):
            kv = rel.columns[pk_idx].value_at(r)
            if kv.is_null:
                continue
            key = self._norm(kv.payload())
            if key in local_keys:
                continue
            record = {}
            for name, col in zip(rel.names, rel.columns):
                v = col.value_at(r)
                if v.is_null:
                    continue
                record[name] = self._norm(v.payload())
            self.table_service.insert_json(table_name, json.dumps(record))
            local_keys.add(key)
            n_repaired += 1
        return n_repaired
