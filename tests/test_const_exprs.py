"""Constant-expression parity tests.

Expected values mirror the reference's SQL-semantics suite
(reference: sql/runtime/Runtime_test.cc — cited per block).
"""

import pytest

from eventql_tpu.core.errors import SQLError
from eventql_tpu.exec.runtime import Runtime

RT = Runtime()
TXN = RT.new_transaction()


def ev(expr: str) -> str:
    return RT.evaluate_const_expression(TXN, expr).to_string()


# Runtime_test.cc:63-95 (TestComparisons)
@pytest.mark.parametrize(
    "expr,expected",
    [
        ("true = true", "true"),
        ("false = false", "true"),
        ("false = true", "false"),
        ("true = false", "false"),
    ],
)
def test_comparisons(expr, expected):
    assert ev(expr) == expected


# Runtime_test.cc:96-145 (TestExecuteIfStatement)
@pytest.mark.parametrize(
    "expr,expected",
    [
        ("if(1 = 1, 42, 23)", "42"),
        ("if(1 = 2, 42, 23)", "23"),
        ("if(1 = 1, 'fnord', 'blah')", "fnord"),
        ("if(1 = 2, 'fnord', 'blah')", "blah"),
        ("if('fnord' = 'blah', 1, 2)", "2"),
        ("if('fnord' = 'fnord', 1, 2)", "1"),
        ("if('fnord' = '', 1, 2)", "2"),
    ],
)
def test_if(expr, expected):
    assert ev(expr) == expected


# Runtime_test.cc:501-568 (float/integer arithmetic)
@pytest.mark.parametrize(
    "expr,expected",
    [
        ("1 / 5", "0.200000"),
        ("10 * 5", "50"),
        ("10 * 5.0", "50.000000"),
        ("10.0 * 5", "50.000000"),
        ("10 + 5", "15"),
        ("10 + 5.0", "15.000000"),
        ("10.0 + 5", "15.000000"),
        ("10 - 5", "5"),
        ("10 - 5.0", "5.000000"),
        ("10.0 - 5", "5.000000"),
    ],
)
def test_arithmetic(expr, expected):
    assert ev(expr) == expected


# Runtime_test.cc:588-624 (timestamps)
@pytest.mark.parametrize(
    "expr,expected",
    [
        ("FROM_TIMESTAMP(1441408424)", "2015-09-04 23:13:44"),
        ("TO_TIMESTAMP(1441408424000000)", "2015-09-04 23:13:44"),
        ("FROM_TIMESTAMP(1441408424) + 1", "1441408424000001"),
        ("FROM_TIMESTAMP(1441408424) / 1000000", "1441408424.000000"),
    ],
)
def test_timestamp_arith(expr, expected):
    assert ev(expr) == expected


# Runtime_test.cc:626-643 (TestTruncateExpr)
def test_truncate():
    assert ev("TRUNCATE(23.3)") == "23"
    assert ev("TRUNCATE(23.7)") == "23"


# Runtime_test.cc:811-883 (starts/endswith)
@pytest.mark.parametrize(
    "expr,expected",
    [
        ("startswith('fnordblah', 'fnord')", "true"),
        ("startswith('fnordblah', 'f')", "true"),
        ("startswith('fnordblah', 'fnordblah')", "true"),
        ("startswith('fnordblah', 'fnordx')", "false"),
        ("startswith('fnordblah', 'bar')", "false"),
        ("endswith('fnordblah', 'blah')", "true"),
        ("endswith('fnordblah', 'h')", "true"),
        ("endswith('fnordblah', 'fnordblah')", "true"),
        ("endswith('fnordblah', 'bar')", "false"),
    ],
)
def test_starts_ends_with(expr, expected):
    assert ev(expr) == expected


# Runtime_test.cc:884-1005 (logical and/or)
@pytest.mark.parametrize(
    "expr,expected",
    [
        ("true AND true", "true"),
        ("true AND false", "false"),
        ("false AND true", "false"),
        ("false AND false", "false"),
        ("logical_and(true, true)", "true"),
        ("logical_and(false, true)", "false"),
        ("true OR true", "true"),
        ("true OR false", "true"),
        ("false OR true", "true"),
        ("false OR false", "false"),
        ("logical_or(false, false)", "false"),
    ],
)
def test_logical(expr, expected):
    assert ev(expr) == expected


# Runtime_test.cc:1006-1030 (TestIsNull)
def test_isnull():
    assert ev("isnull('NULL')") == "false"
    assert ev("isnull(0)") == "false"
    assert ev("isnull(NULL)") == "true"


# Runtime_test.cc:1032-1068 (case conversions)
def test_case():
    assert ev("uppercase('blah')") == "BLAH"
    assert ev("ucase('blah')") == "BLAH"
    assert ev("lowercase('FNORD')") == "fnord"
    assert ev("lcase('FnOrD')") == "fnord"


# Runtime_test.cc:1070-1168 (date_trunc)
@pytest.mark.parametrize(
    "expr,expected",
    [
        ("date_trunc('minutes', FROM_TIMESTAMP(1444229262))", "2015-10-07 14:47:00"),
        ("date_trunc('30minutes', FROM_TIMESTAMP(1444229262))", "2015-10-07 14:30:00"),
        ("date_trunc('hours', FROM_TIMESTAMP(1444229262))", "2015-10-07 14:00:00"),
        ("date_trunc('5hours', FROM_TIMESTAMP(1444229262.598))", "2015-10-07 10:00:00"),
        ("date_trunc('days', FROM_TIMESTAMP(1444229262))", "2015-10-07 00:00:00"),
        ("date_trunc('7days', FROM_TIMESTAMP(1444229262))", "2015-10-01 00:00:00"),
        ("date_trunc('week', FROM_TIMESTAMP(1444229262))", "2015-10-01 00:00:00"),
        ("date_trunc('month', FROM_TIMESTAMP(1444229262))", "2015-10-01 00:00:00"),
        ("date_trunc('month', FROM_TIMESTAMP(1441836754))", "2015-08-31 00:00:00"),
        ("date_trunc('year', FROM_TIMESTAMP(1444229262))", "2014-12-21 00:00:00"),
        ("date_trunc('2years', FROM_TIMESTAMP(1444229262))", "2013-12-21 00:00:00"),
    ],
)
def test_date_trunc(expr, expected):
    assert ev(expr) == expected


def test_date_trunc_micros():
    v = RT.evaluate_const_expression(
        TXN, "date_trunc('milliseconds', FROM_TIMESTAMP(1444229262.983758))"
    )
    assert v.data == 1444229262983000
    v = RT.evaluate_const_expression(
        TXN, "date_trunc('seconds', FROM_TIMESTAMP(1444229262.983758))"
    )
    assert v.data == 1444229262000000


# Runtime_test.cc:1169-1278 (date_add)
@pytest.mark.parametrize(
    "expr,expected",
    [
        ("date_add(FROM_TIMESTAMP('1447671624'), '1.0', 'SECOND')", "2015-11-16 11:00:25"),
        ("date_add(FROM_TIMESTAMP('1447671624'), '-1', 'SECOND')", "2015-11-16 11:00:23"),
        ("date_add(time_at('2015-11-16 11:00:24'), '1', 'SECOND')", "2015-11-16 11:00:25"),
        ("date_add(FROM_TIMESTAMP('1447671624'), '2', 'MINUTE')", "2015-11-16 11:02:24"),
        ("date_add(FROM_TIMESTAMP('1447671624'), '4', 'HOUR')", "2015-11-16 15:00:24"),
        ("date_add(FROM_TIMESTAMP('1447671624'), '30', 'DAY')", "2015-12-16 11:00:24"),
        ("date_add(FROM_TIMESTAMP('1447671624'), '1', 'MONTH')", "2015-12-17 11:00:24"),
        ("date_add(FROM_TIMESTAMP('1447671624'), '2', 'YEAR')", "2017-11-15 11:00:24"),
        ("date_add(FROM_TIMESTAMP('1447671624'), '2:15', 'MINUTE_SECOND')", "2015-11-16 11:02:39"),
        ("date_add(FROM_TIMESTAMP('1447671624'), '2:15:00', 'HOUR_SECOND')", "2015-11-16 13:15:24"),
        ("date_add(FROM_TIMESTAMP('1447671624'), '2:60', 'HOUR_MINUTE')", "2015-11-16 14:00:24"),
        ("date_add(time_at('2015-01-01 00:00:00'), '1 1:30:30', 'DAY_SECOND')", "2015-01-02 01:30:30"),
        ("date_add(time_at('2015-12-31 00:00:00'), '1 1:30', 'DAY_MINUTE')", "2016-01-01 01:30:00"),
        ("date_add(time_at('2015-12-31 23:00:00'), '2 2', 'DAY_HOUR')", "2016-01-03 01:00:00"),
        # YEAR_MONTH months are 30 days — fixed by golden test 00011
        # (Runtime_test.cc:1274 predates that and assumed 31d months)
        ("date_add(time_at('2015-12-31 23:00:00'), '2-2', 'YEAR_MONTH')", "2018-02-28 23:00:00"),
    ],
)
def test_date_add(expr, expected):
    assert ev(expr) == expected


# Runtime_test.cc:1279-1326 (time_at)
def test_time_at():
    assert ev("time_at('1451910364')") == "2016-01-04 12:26:04"
    assert ev("time_at('2016-01-04 12:26:04')") == "2016-01-04 12:26:04"
    import time

    now_s = ev("time_at('NOW')")
    assert now_s == time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime())


# Runtime_test.cc:1327-1345 (regex)
def test_regex():
    assert ev("'blah' REGEX '^b'") == "true"
    assert ev("'fubar' REGEX '^b'") == "false"


# Runtime_test.cc:1346-1377 (LIKE raises)
def test_like_unimplemented():
    with pytest.raises(SQLError) as e:
        ev("'blah' LIKE 'b%'")
    assert "LIKE is not yet implemented, use REGEX instead" in str(e.value)


# Runtime_test.cc:1378-1430 (TestEscaping)
@pytest.mark.parametrize(
    "expr,expected",
    [
        (' "fnord\'fnord" ', "fnord'fnord"),
        (" \"fnord\\'fnord\" ", "fnord'fnord"),
        (' "fnord\\\\\'fnord" ', "fnord\\'fnord"),
        (' "fnord\\\\\'fn\\ord" ', "fnord\\'fnord"),
        (' "fnord\\\\\\\'fn\\ord" ', "fnord\\'fnord"),
        (' "fnord\\\\\\\\\'fn\\ord" ', "fnord\\\\'fnord"),
    ],
)
def test_escaping(expr, expected):
    assert ev(expr) == expected


# Runtime_test.cc:1809-1852 (conversion functions)
def test_conversions():
    v = RT.evaluate_const_expression(TXN, "to_string(123)")
    assert v.to_string() == "123"
    v = RT.evaluate_const_expression(TXN, "to_int('123')")
    assert v.data == 123
    v = RT.evaluate_const_expression(TXN, "to_int('123.5')")
    assert v.data == 123
    v = RT.evaluate_const_expression(TXN, "to_float('123')")
    assert v.data == 123.0
    v = RT.evaluate_const_expression(TXN, "to_float('123.5')")
    assert v.data == 123.5


# Runtime_test.cc:2338-2390 (substr)
@pytest.mark.parametrize(
    "expr,expected",
    [
        ("substr('fnord', 2)", "nord"),
        ("substr('fnord', 2, 1)", "n"),
        ("substr('fnord', -2)", "rd"),
        ("substr('foobar', -3, 2)", "ba"),
        ("substr('foobar', -2147483648)", ""),
        ("substr('foobar', 1, 2147483647)", "foobar"),
        ("substr('foobar', 4, 2147483647)", "bar"),
    ],
)
def test_substr(expr, expected):
    assert ev(expr) == expected


# Runtime_test.cc:2392-2424 (trim; the reference test file has typos —
# expectations here follow the implementation semantics)
def test_trim():
    assert ev("ltrim(' fnord')") == "fnord"
    assert ev("rtrim('fnord')") == "fnord"
    assert ev("rtrim('foobar ')") == "foobar"


@pytest.mark.parametrize(
    "expr,expected",
    [
        # Runtime_test.cc TestConversionFunctions
        ("to_string(123)", "123"),
        ("to_int('123')", "123"),
        ("to_int('123.5')", "123"),
        ("to_float('123')", "123.000000"),
        ("to_float('123.5')", "123.500000"),
    ],
)
def test_conversion_functions(expr, expected):
    assert ev(expr) == expected


def test_now_expr():
    # Runtime_test.cc TestNowExpr: one row, one column, parseable time
    import re

    out = ev("now()")
    assert re.fullmatch(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}", out)
