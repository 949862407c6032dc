"""MapReduce service.

Re-implements the reference's MapReduce subsystem surface
(reference: mapreduce/mapreduce_service.h:37-77 mapPartition /
reduceTables / saveResultToTable; task DAG from JSON specs,
mapreduce_task_builder.cc; scheduler with bounded shard concurrency,
mapreduce_scheduler.cc:49-115, 64 concurrent tasks) with Python user
functions instead of SpiderMonkey JavaScript — the host-side runtime
language choice, orthogonal to the TPU compute path.

Job spec (JSON), mirroring the reference's task ops:
  {"jobs": {
      "<name>": {"op": "map_table", "table": t, "map_fn": "<python>"},
      "<name>": {"op": "reduce", "sources": [names], "reduce_fn": ...,
                  "num_shards": n},
      "<name>": {"op": "return_results", "sources": [names]},
      "<name>": {"op": "save_to_table", "sources": [names], "table": t}
   },
   "execute": ["<name>", ...]}

map_fn(row: dict) -> list[(key, value)]
reduce_fn(key, values: iterator) -> list[(key, value)]
"""

from __future__ import annotations

import concurrent.futures
import hashlib
import json
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

from eventql_tpu.core.errors import RuntimeError_
from eventql_tpu.core.types import SType, SValue

# reference: mapreduce_scheduler.h kDefaultMaxConcurrentTasks
DEFAULT_MAX_CONCURRENT_TASKS = 64


def _is_js_source(source: str) -> bool:
    s = source.lstrip()
    return s.startswith("function") and "{" in s


def _compile_task_fn(spec: dict, key: str, kind: str):
    """Compile a task's user function. JavaScript sources (the
    reference's UDF language — SpiderMonkey in
    mapreduce/runtime/javascript/) run on the in-repo ES5 interpreter
    with the task's shipped globals/params closure; Python sources run
    natively."""
    source = spec[key]
    if spec.get("lang") == "js" or _is_js_source(source):
        from eventql_tpu.mapreduce.js_runtime import (
            js_map_adapter,
            js_reduce_adapter,
        )

        adapter = js_map_adapter if kind == "map" else js_reduce_adapter
        return adapter(source, spec.get("globals", ""), _params_json(spec))
    return _compile_fn(source, kind)


def _params_json(spec: dict) -> str:
    p = spec.get("params", "")
    if isinstance(p, str):
        return p
    return json.dumps(p) if p else ""


def _compile_fn(source: str, name_hint: str):
    """Compile a user function from source: either a bare lambda
    expression or a module defining one or more functions (the last
    definition wins)."""
    try:
        v = eval(source.strip(), {})  # noqa: S307 — user jobs, like JS
        if callable(v):
            return v
    except Exception:
        pass
    env: Dict = {}
    try:
        exec(source, env)  # noqa: S102
    except Exception as e:
        raise RuntimeError_(f"invalid {name_hint} function: {e}")
    fns = [
        v
        for k, v in env.items()
        if callable(v) and not k.startswith("__")
    ]
    if not fns:
        raise RuntimeError_(f"no callable found in {name_hint} function")
    return fns[-1]


class MapReduceService:
    def __init__(
        self,
        table_service,
        max_concurrent_tasks: int = DEFAULT_MAX_CONCURRENT_TASKS,
        spill_dir=None,
    ):
        self.table_service = table_service
        self.max_concurrent_tasks = max_concurrent_tasks
        # result files: task outputs spill to sstable files like the
        # reference (mapreduce_service.cc:177 writes each task result as
        # an sstable; downstream tasks read cursors over them)
        self.spill_dir = spill_dir
        self.results: Dict[str, List[Tuple[str, str]]] = {}

    # -- task primitives (reference: mapreduce/tasks/) ------------------
    def map_table_shard(self, rel, map_fn) -> List[Tuple[str, str]]:
        out: List[Tuple[str, str]] = []
        for i in range(rel.num_rows):
            row = {
                name: col.value_at(i).to_string()
                if col.value_at(i).is_null is False
                else None
                for name, col in zip(rel.names, rel.columns)
            }
            for k, v in map_fn(row) or []:
                out.append((str(k), str(v)))
        return out

    def reduce_shard(self, pairs: List[Tuple[str, str]], reduce_fn):
        grouped: Dict[str, List[str]] = defaultdict(list)
        for k, v in pairs:
            grouped[k].append(v)
        out: List[Tuple[str, str]] = []
        for k in sorted(grouped):
            for rk, rv in reduce_fn(k, iter(grouped[k])) or []:
                out.append((str(rk), str(rv)))
        return out

    # -- job execution --------------------------------------------------
    def execute(self, job_spec: dict) -> List[List[Tuple[str, str]]]:
        jobs = job_spec.get("jobs", {})
        targets = job_spec.get("execute", [])
        cache: Dict[str, List[Tuple[str, str]]] = {}
        outputs = []
        for t in targets:
            outputs.append(self._run_job(t, jobs, cache))
        return outputs

    def _run_job(self, name, jobs, cache):
        if name in cache:
            return cache[name]
        spec = jobs.get(name)
        if spec is None:
            raise RuntimeError_(f"unknown job: '{name}'")
        op = spec.get("op")

        if op == "map_table":
            table = spec.get("table") or spec["table_name"]
            map_fn = _compile_task_fn(spec, "map_fn", "map")
            shards = self._table_shards(
                table,
                spec.get("keyrange_begin"),
                spec.get("keyrange_limit"),
            )
            # bounded shard concurrency
            # (reference: mapreduce_scheduler.cc:49-115)
            with concurrent.futures.ThreadPoolExecutor(
                max_workers=min(self.max_concurrent_tasks, max(len(shards), 1))
            ) as pool:
                parts = list(
                    pool.map(lambda s: self.map_table_shard(s, map_fn), shards)
                )
            out = [p for part in parts for p in part]
        elif op == "reduce":
            reduce_fn = _compile_task_fn(spec, "reduce_fn", "reduce")
            pairs: List[Tuple[str, str]] = []
            for src in spec.get("sources", []):
                pairs.extend(self._run_job(src, jobs, cache))
            num_shards = int(spec.get("num_shards", 1))
            if num_shards <= 1:
                out = self.reduce_shard(pairs, reduce_fn)
            else:
                buckets: List[List[Tuple[str, str]]] = [
                    [] for _ in range(num_shards)
                ]
                for k, v in pairs:
                    h = int(
                        hashlib.sha1(k.encode()).hexdigest()[:8], 16
                    ) % num_shards
                    buckets[h].append((k, v))
                with concurrent.futures.ThreadPoolExecutor(
                    max_workers=min(self.max_concurrent_tasks, num_shards)
                ) as pool:
                    parts = list(
                        pool.map(
                            lambda b: self.reduce_shard(b, reduce_fn), buckets
                        )
                    )
                out = [p for part in parts for p in part]
        elif op == "return_results":
            out = []
            for src in spec.get("sources", []):
                out.extend(self._run_job(src, jobs, cache))
            serialize_src = spec.get("serialize_fn") or ""
            if serialize_src:
                # reference: callSerializeFunction(key, value) per tuple
                # (javascript_context.cc:439+)
                from eventql_tpu.mapreduce.js_runtime import TaskContext

                ser = TaskContext(
                    serialize_src, spec.get("globals", ""),
                    _params_json(spec))
                # serialized results are raw output strings (empty ones
                # dropped, return_results.cc:102-108); key "" marks raw
                out = [
                    ("", s)
                    for s in (ser.call_serialize(k, v) for k, v in out)
                    if s
                ]
        elif op == "save_to_table":
            out = []
            for src in spec.get("sources", []):
                out.extend(self._run_job(src, jobs, cache))
            self._save_to_table(spec.get("table") or spec["table_name"], out)
        else:
            raise RuntimeError_(f"unknown mapreduce op: '{op}'")

        if self.spill_dir is not None:
            out = self._spill_roundtrip(name, out)
        cache[name] = out
        return out

    def _spill_roundtrip(self, name, pairs):
        """Persist a task result as an sstable file and read it back
        (reference: result ids map to sstable files,
        mapreduce_service.cc:442-462)."""
        import os as _os
        import uuid as _uuid

        from eventql_tpu.columnar.sstable import SSTableReader, SSTableWriter

        _os.makedirs(self.spill_dir, exist_ok=True)
        path = _os.path.join(
            self.spill_dir, f"mr-{name}-{_uuid.uuid4().hex[:12]}.sst"
        )
        w = SSTableWriter(path, userdata=name.encode())
        for k, v in pairs:
            w.append(k.encode(), v.encode())
        w.finalize()
        r = SSTableReader(path)
        return [(k.decode(), v.decode()) for k, v in r.cursor()]

    # -- JS job programs ---------------------------------------------------
    def execute_script(self, program: str):
        """Run a JavaScript MapReduce job program (the reference's
        MapReduceService::executeScript path: the script declares tasks
        through the EVQL/Z1 api and triggers them via evql_executemr;
        results stream back to the caller)."""
        from eventql_tpu.mapreduce.js_runtime import (
            JobContext,
            normalize_task_spec,
        )

        results: List[Tuple[str, str]] = []
        logs: List[str] = []

        def execute_tasks(task_list, root_id):
            jobs = {
                t["id"]: normalize_task_spec(t) for t in task_list
            }
            cache: Dict[str, List[Tuple[str, str]]] = {}
            results.extend(self._run_job(root_id, jobs, cache))

        ctx = JobContext(
            execute_tasks=execute_tasks,
            write_output=lambda s: results.append(("", s)),
            log_fn=logs.append,
        )
        ctx.run(program)
        return results, logs

    # -- helpers --------------------------------------------------------
    def _table_shards(self, table_name: str, keyrange_begin=None,
                      keyrange_limit=None):
        shards_fn = getattr(self.table_service, "shards", None)
        if shards_fn is not None:
            try:
                if keyrange_begin is not None or keyrange_limit is not None:
                    try:
                        return shards_fn(
                            table_name, keyrange_begin, keyrange_limit)
                    except TypeError:
                        pass
                return shards_fn(table_name)
            except Exception:
                pass
        return [self.table_service.get_table_data(table_name)]

    def _save_to_table(self, table_name: str, pairs):
        # rows land as {key, value} string columns (the reference stores
        # sstables of msgpacked rows; the observable surface is a table)
        svc = self.table_service
        if svc.describe(table_name) is None:
            from eventql_tpu.plan.nodes import ColumnDefinition, CreateTableNode

            svc.create_table(
                CreateTableNode(
                    table_name,
                    [
                        ColumnDefinition("key", "STRING"),
                        ColumnDefinition("value", "STRING"),
                    ],
                    ["key"],
                    None,
                    [],
                )
            )
        for k, v in pairs:
            svc.insert(
                table_name,
                ["key", "value"],
                [SValue.new_string(k), SValue.new_string(v)],
            )
