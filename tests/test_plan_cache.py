"""Server-side plan cache (exec/runtime.py PlanCache): repeated
queries skip parse+plan; schema changes invalidate; data changes stay
visible through a cached plan (plans are re-executed against the
transaction's current table data)."""

from eventql_tpu.db.lsm import DurableTableService
from eventql_tpu.db.table_service import TableService
from eventql_tpu.exec.runtime import PlanCache, Runtime


def run(rt, svc, query):
    txn = rt.new_transaction(svc)
    return rt.build_query_plan(txn, query).execute(0)


def test_select_plan_cached_and_data_changes_visible():
    rt = Runtime(plan_cache=PlanCache())
    svc = TableService()
    run(rt, svc, "CREATE TABLE t (id uint64, v uint64, PRIMARY KEY (id));")
    run(rt, svc, "INSERT INTO t (id, v) VALUES (1, 10);")

    q = "select id, v from t order by id;"
    r1 = run(rt, svc, q)
    assert r1.rows == [["1", "10"]]
    assert rt.plan_cache.misses >= 1
    hits_before = rt.plan_cache.hits

    # same query again: plan comes from the cache
    r2 = run(rt, svc, q)
    assert r2.rows == [["1", "10"]]
    assert rt.plan_cache.hits == hits_before + 1

    # new data is visible through the cached plan
    run(rt, svc, "INSERT INTO t (id, v) VALUES (2, 20);")
    r3 = run(rt, svc, q)
    assert r3.rows == [["1", "10"], ["2", "20"]]


def test_ddl_invalidates_wildcard_plans():
    rt = Runtime(plan_cache=PlanCache())
    svc = TableService()
    run(rt, svc, "CREATE TABLE t (id uint64, PRIMARY KEY (id));")
    run(rt, svc, "INSERT INTO t (id) VALUES (7);")

    r1 = run(rt, svc, "select * from t;")
    assert r1.columns == ["id"]
    r1b = run(rt, svc, "select * from t;")  # cached
    assert r1b.columns == ["id"]

    # ALTER TABLE bumps the schema version: the wildcard re-plans
    run(rt, svc, "ALTER TABLE t ADD COLUMN v uint64;")
    r2 = run(rt, svc, "select * from t;")
    assert r2.columns == ["id", "v"]


def test_dml_statements_not_cached():
    rt = Runtime(plan_cache=PlanCache())
    svc = TableService()
    run(rt, svc, "CREATE TABLE t (id uint64, PRIMARY KEY (id));")
    ins = "INSERT INTO t (id) VALUES (1);"
    run(rt, svc, ins)
    key = (id(svc), svc.plan_cache_key(), ins)
    assert rt.plan_cache.get(key) is None


def test_durable_service_ddl_bumps_version(tmp_path):
    svc = DurableTableService(str(tmp_path / "d"))
    rt = Runtime(plan_cache=PlanCache())
    v0 = svc.plan_cache_key()
    run(rt, svc, "CREATE TABLE t (id uint64, PRIMARY KEY (id));")
    v1 = svc.plan_cache_key()
    assert v1 != v0
    run(rt, svc, "DROP TABLE t;")
    assert svc.plan_cache_key() != v1


def test_lru_eviction():
    pc = PlanCache(max_entries=2)
    pc.put("a", ["na"])
    pc.put("b", ["nb"])
    assert pc.get("a") == ["na"]  # refresh a
    pc.put("c", ["nc"])  # evicts b (LRU)
    assert pc.get("b") is None
    assert pc.get("a") == ["na"]
    assert pc.get("c") == ["nc"]


def test_alter_after_batch_insert_aligns_arena():
    """ALTER TABLE after a columnar batch insert: older arena batches
    re-shape to the current schema (new columns NULL, dropped columns
    gone) — regression found driving add_field over HTTP."""
    import json as _json

    rt = Runtime(plan_cache=PlanCache())
    svc = TableService()
    run(rt, svc, "CREATE TABLE t (id uint64, v uint64, PRIMARY KEY (id));")
    svc.insert_json_batch("t", _json.dumps([{"id": 1, "v": 10}]).encode())
    run(rt, svc, "ALTER TABLE t ADD COLUMN w uint64;")
    r = run(rt, svc, "select * from t order by id;")
    assert r.columns == ["id", "v", "w"]
    assert r.rows == [["1", "10", "NULL"]]
    svc.insert_json_batch("t", _json.dumps([{"id": 2, "v": 20, "w": 5}]).encode())
    r = run(rt, svc, "select * from t order by id;")
    assert r.rows == [["1", "10", "NULL"], ["2", "20", "5"]]
    run(rt, svc, "ALTER TABLE t DROP COLUMN v;")
    r = run(rt, svc, "select * from t order by id;")
    assert r.columns == ["id", "w"]
    assert r.rows == [["1", "NULL"], ["2", "5"]]
