"""DDL/DML tests against the in-memory table service, modeled on the
reference's system test flow (reference: test/system/basic_sql/ —
create table, insert, query it back)."""

import pytest

from eventql_tpu.core.errors import SQLError
from eventql_tpu.db.table_service import TableService
from eventql_tpu.exec.runtime import Runtime


@pytest.fixture
def svc():
    return TableService()


def run(svc, query):
    rt = Runtime()
    txn = rt.new_transaction(svc)
    plan = rt.build_query_plan(txn, query)
    results = [plan.execute(i) for i in range(plan.num_queries)]
    return results[-1]


# reference: test/system/basic_sql/create_customers.sql
CREATE_CUSTOMERS = """
CREATE TABLE customers (
  customerid uint64,
  customername string,
  contactname string,
  address string,
  city string,
  postalcode string,
  country string,
  PRIMARY KEY (customerid),
  PARTITION KEY (customerid)
);
"""


def test_create_insert_select(svc):
    run(svc, CREATE_CUSTOMERS)
    run(
        svc,
        "INSERT INTO customers (customerid, customername, city) VALUES"
        " (1, 'Alfreds Futterkiste', 'Berlin');",
    )
    run(
        svc,
        "INSERT INTO customers (customerid, customername, city) VALUES"
        " (2, 'Ana Trujillo', 'México D.F.');",
    )
    r = run(svc, "select customerid, customername, city from customers order by customerid;")
    assert r.num_rows == 2
    assert r.get_row(0) == ["1", "Alfreds Futterkiste", "Berlin"]
    assert r.get_row(1) == ["2", "Ana Trujillo", "México D.F."]
    # unset columns are NULL
    r = run(svc, "select country from customers;")
    assert r.get_row(0) == ["NULL"]


def test_insert_json(svc):
    run(svc, CREATE_CUSTOMERS)
    run(
        svc,
        'INSERT INTO customers FROM JSON \'{"customerid": 7,'
        ' "customername": "Blondel", "country": "France"}\';',
    )
    r = run(svc, "select customerid, customername, country from customers;")
    assert r.get_row(0) == ["7", "Blondel", "France"]


def test_create_requires_valid_pk_type(svc):
    with pytest.raises(SQLError) as e:
        run(
            svc,
            "CREATE TABLE t (x double, PRIMARY KEY (x));",
        )
    assert "first column in the PRIMARY KEY" in str(e.value)


def test_nested_record_columns(svc):
    run(
        svc,
        """
        CREATE TABLE events (
          time datetime,
          attr RECORD (
            referrer string,
            score double
          ),
          PRIMARY KEY (time)
        );
        """,
    )
    rt = Runtime()
    txn = rt.new_transaction(svc)
    info = svc.describe("events")
    assert [c[0] for c in info.columns] == ["time", "attr.referrer", "attr.score"]
    run(
        svc,
        'INSERT INTO events FROM JSON \'{"time": 1441408424000000,'
        ' "attr": {"referrer": "x", "score": 1.5}}\';',
    )
    r = run(svc, "select time, attr.referrer, attr.score from events;")
    assert r.get_row(0) == ["2015-09-04 23:13:44", "x", "1.500000"]


def test_alter_and_drop(svc):
    run(svc, CREATE_CUSTOMERS)
    run(svc, "ALTER TABLE customers ADD COLUMN segment string;")
    info = svc.describe("customers")
    assert any(c[0] == "segment" for c in info.columns)
    run(svc, "ALTER TABLE customers DROP COLUMN segment;")
    info = svc.describe("customers")
    assert not any(c[0] == "segment" for c in info.columns)
    run(svc, "DROP TABLE customers;")
    assert svc.describe("customers") is None


def test_show_tables_lists_created(svc):
    run(svc, CREATE_CUSTOMERS)
    r = run(svc, "show tables;")
    assert r.get_row(0)[0] == "customers"


def test_group_by_over_inserted_rows(svc):
    run(svc, CREATE_CUSTOMERS)
    for i, city in enumerate(["Berlin", "Berlin", "Paris"]):
        run(
            svc,
            f"INSERT INTO customers (customerid, city) VALUES ({i + 1}, '{city}');",
        )
    r = run(
        svc,
        "select city, count(1) from customers group by city order by city;",
    )
    assert r.rows == [["Berlin", "2"], ["Paris", "1"]]
