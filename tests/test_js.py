"""ES5 interpreter + JS MapReduce runtime tests.

The reference executes MapReduce user functions as JavaScript on
SpiderMonkey (mapreduce/runtime/javascript/javascript_context.cc);
these tests cover the in-repo interpreter's language semantics and the
reference calling conventions (map: __fn(row); reduce: __fn(key,
iter{hasNext,next}); tuples via ToString/JSON.stringify —
enumerateTuples)."""

import pytest

from eventql_tpu.mapreduce.js.interp import (
    UNDEFINED,
    Interpreter,
    JSArray,
    JSError,
    JSObject,
    js_to_python,
)
from eventql_tpu.mapreduce.js.lexer import JSSyntaxError


def ev(src):
    return js_to_python(Interpreter().run(src))


# -- language basics ---------------------------------------------------------

@pytest.mark.parametrize(
    "src,expected",
    [
        ("1 + 2 * 3;", 7),
        ("(1 + 2) * 3;", 9),
        ("10 % 3;", 1),
        ("2 + '3';", "23"),
        ("'2' * '3';", 6),
        ("1 / 0;", float("inf")),
        ("-1 / 0;", float("-inf")),
        ("7 >> 1;", 3),
        ("-1 >>> 28;", 15),
        ("5 & 3;", 1),
        ("5 | 3;", 7),
        ("5 ^ 3;", 6),
        ("~5;", -6),
        ("1 << 31;", -2147483648),
        ("'a' + 1 + 2;", "a12"),
        ("1 + 2 + 'a';", "3a"),
        ("true + true;", 2),
        ("'abc'.length;", 3),
        ("typeof 1;", "number"),
        ("typeof 'x';", "string"),
        ("typeof {};", "object"),
        ("typeof [];", "object"),
        ("typeof null;", "object"),
        ("typeof undefined;", "undefined"),
        ("typeof function(){};", "function"),
        ("typeof not_defined_anywhere;", "undefined"),
        ("1 == '1';", True),
        ("1 === '1';", False),
        ("null == undefined;", True),
        ("null === undefined;", False),
        ("NaN == NaN;", False),
        ("'b' > 'a';", True),
        ("'10' < '9';", True),  # string compare
        ("10 < '9';", False),  # numeric compare
        ("!'';", True),
        ("!!'0';", True),  # non-empty string is truthy
        ("!!0;", False),
        ("1 && 2;", 2),
        ("0 || 'x';", "x"),
        ("null || undefined || 3;", 3),
        ("true ? 'y' : 'n';", "y"),
        ("'x' in {x: 1};", True),
        ("'y' in {x: 1};", False),
        ("0 + +'12';", 12),
        ("void 0 === undefined;", True),
    ],
)
def test_expressions(src, expected):
    assert ev(src) == expected


def test_var_scoping_and_closures():
    src = """
    function counter() {
      var n = 0;
      return function() { n = n + 1; return n; };
    }
    var c1 = counter();
    var c2 = counter();
    c1(); c1(); c2();
    [c1(), c2()];
    """
    assert ev(src) == [3, 2]


def test_hoisting():
    assert ev("f(); function f() { return 42; }  f();") == 42
    assert ev("var r = typeof x; var x = 1; r;") == "undefined"


def test_control_flow():
    src = """
    var total = 0;
    for (var i = 0; i < 10; i++) {
      if (i % 2 == 0) continue;
      if (i > 7) break;
      total += i;
    }
    total;
    """
    assert ev(src) == 1 + 3 + 5 + 7

    assert ev("""
    var s = '';
    var obj = {a: 1, b: 2, c: 3};
    for (var k in obj) { s += k; }
    s;
    """) == "abc"

    assert ev("""
    var n = 0;
    do { n++; } while (n < 3);
    n;
    """) == 3

    assert ev("""
    var x = 2, out = '';
    switch (x) {
      case 1: out += 'one'; break;
      case 2: out += 'two';
      case 3: out += 'three'; break;
      default: out += 'other';
    }
    out;
    """) == "twothree"


def test_try_catch_finally():
    src = """
    var log = [];
    try {
      throw "boom";
    } catch (e) {
      log.push('caught:' + e);
    } finally {
      log.push('finally');
    }
    log.join(',');
    """
    assert ev(src) == "caught:boom,finally"

    assert ev("""
    function f() { try { return 'a'; } finally { g = 'ran'; } }
    var g = '';
    [f(), g];
    """) == ["a", "ran"]


def test_exceptions_propagate():
    with pytest.raises(JSError, match="boom"):
        Interpreter().run("throw new Error('boom');")
    with pytest.raises(JSError, match="not defined"):
        Interpreter().run("undefined_variable + 1;")
    with pytest.raises(JSSyntaxError):
        Interpreter().run("var = 2;")


def test_objects_and_arrays():
    assert ev("var o = {a: {b: [1, 2, 3]}}; o.a.b[1];") == 2
    assert ev("var a = []; a[3] = 'x'; a.length;") == 4
    assert ev("var a = [1,2,3]; a.length = 1; a;") == [1]
    assert ev("var o = {}; o['k'] = 5; o.k;") == 5
    assert ev("var o = {a:1}; delete o.a; o.hasOwnProperty('a');") is False
    assert ev("Object.keys({x:1, y:2});") == ["x", "y"]
    assert ev("[1,2,3].indexOf(2);") == 1
    assert ev("[3,1,2].sort();") == [1, 2, 3]
    assert ev("[10,9,1].sort();") == [1, 10, 9]  # default sort is lexicographic
    assert ev("[10,9,1].sort(function(a,b){return a-b;});") == [1, 9, 10]
    assert ev("[1,2,3,4].filter(function(x){return x%2==0;});") == [2, 4]
    assert ev("[1,2,3].map(function(x){return x*2;});") == [2, 4, 6]
    assert ev("[1,2,3].reduce(function(a,b){return a+b;}, 10);") == 16
    assert ev("[1,2,3].slice(1);") == [2, 3]
    assert ev("[[1],[2]].concat([[3]]);") == [[1], [2], [3]]
    assert ev("var a=[1,2,3,4]; a.splice(1,2); a;") == [1, 4]
    assert ev("[1,2,3].join('-');") == "1-2-3"
    assert ev("'a,b,c'.split(',');") == ["a", "b", "c"]


def test_string_methods():
    assert ev("'Hello'.toUpperCase();") == "HELLO"
    assert ev("'Hello'.charAt(1);") == "e"
    assert ev("'Hello'.charCodeAt(0);") == 72
    assert ev("'hello world'.indexOf('world');") == 6
    assert ev("'hello'.substring(1, 3);") == "el"
    assert ev("'hello'.substr(1, 3);") == "ell"
    assert ev("'hello'.slice(-3);") == "llo"
    assert ev("'  x  '.trim();") == "x"
    assert ev("'a-b-c'.replace('-', '+');") == "a+b-c"
    assert ev("'a-b-c'.replace(/-/g, '+');") == "a+b+c"
    assert ev("'foo123bar'.match(/\\d+/)[0];") == "123"
    assert ev("/^ab+c$/.test('abbbc');") is True
    assert ev("'x1y2'.replace(/\\d/g, function(d){return d*2;});") == "x2y4"


def test_number_formatting():
    assert ev("String(1);") == "1"
    assert ev("String(1.5);") == "1.5"
    assert ev("String(0.1 + 0.2);") == "0.30000000000000004"
    assert ev("String(1/0);") == "Infinity"
    assert ev("String(0/0);") == "NaN"
    assert ev("(3.14159).toFixed(2);") == "3.14"
    assert ev("(255).toString(16);") == "ff"
    assert ev("parseInt('42px');") == 42
    assert ev("parseInt('0x1f');") == 31
    assert ev("parseInt('101', 2);") == 5
    assert ev("parseFloat('3.5e2x');") == 350
    assert ev("isNaN(parseInt('zz'));") is True


def test_math():
    assert ev("Math.floor(1.9);") == 1
    assert ev("Math.round(2.5);") == 3
    assert ev("Math.round(-2.5);") == -2  # JS rounds .5 toward +inf
    assert ev("Math.max(1, 5, 3);") == 5
    assert ev("Math.min();") == float("inf")
    assert ev("Math.pow(2, 10);") == 1024
    assert ev("Math.abs(-4);") == 4
    assert ev("Math.sqrt(16);") == 4


def test_json():
    assert ev("JSON.stringify({a: 1, b: 'x', c: [true, null]});") == \
        '{"a":1,"b":"x","c":[true,null]}'
    assert ev("JSON.stringify({u: undefined, f: function(){}});") == "{}"
    assert ev("JSON.stringify([undefined]);") == "[null]"
    assert ev("JSON.parse('{\"a\": [1, 2]}').a[1];") == 2
    assert ev("JSON.stringify('he\"llo');") == '"he\\"llo"'
    # round trip
    assert ev("JSON.parse(JSON.stringify({x: {y: [1.5, 'z']}})).x.y[0];") \
        == 1.5
    # reviver
    assert ev("""
    JSON.parse('{"a": 1, "b": 2}', function(k, v) {
      return typeof v == 'number' ? v * 10 : v;
    }).b;
    """) == 20
    # replacer function
    assert ev("""
    JSON.stringify({a: 1, b: 2}, function(k, v) {
      return k == 'b' ? undefined : v;
    });
    """) == '{"a":1}'


def test_function_tools():
    assert ev("""
    function add(a, b) { return a + b; }
    add.apply(null, [2, 3]);
    """) == 5
    assert ev("""
    function who() { return this.name; }
    who.call({name: 'zed'});
    """) == "zed"
    assert ev("""
    var obj = {n: 5, get: function() { return this.n; }};
    obj.get();
    """) == 5
    assert ev("var f = function mul(x){return x<=1?1:x*mul(x-1);}; f(5);") \
        == 120
    assert ev("""
    function f(a, b) { return arguments.length; }
    f(1, 2, 3);
    """) == 3
    # String(fn) returns source (the closure wire format)
    assert ev("String(function add(a, b) { return a + b; });") == \
        "function add(a, b) { return a + b; }"


def test_new_and_instanceof():
    assert ev("""
    function Point(x, y) { this.x = x; this.y = y; }
    var p = new Point(3, 4);
    p.x + p.y;
    """) == 7
    assert ev("[] instanceof Array;") is True
    assert ev("({}) instanceof Array;") is False
    assert ev("new RegExp('a+', 'i').test('AAA');") is True
    assert ev("var e = new Error('msg'); e.message;") == "msg"
    assert ev("new Array(3).length;") == 3


def test_eval_round_trip():
    # the reference ships closures as String(fn) and revives them via
    # eval (prelude.js __decode_js)
    assert ev("""
    var src = String(function(x) { return x * 3; });
    eval('var revived = ' + src);
    revived(7);
    """) == 21


def test_asi():
    assert ev("var a = 1\nvar b = 2\na + b") == 3
    assert ev("function f() { return\n  5; }\nf() === undefined") is True


def test_global_this():
    assert ev("x = 5; this.x;") == 5
    assert ev("var y = 1; globalThis.y;") == 1


# -- the MapReduce runtime ---------------------------------------------------

def test_task_context_map():
    from eventql_tpu.mapreduce.js_runtime import TaskContext

    ctx = TaskContext(
        "function(row) { return [[row.user, row.value * 2]]; }")
    assert ctx.call_map({"user": "a", "value": 21}) == [("a", "42")]
    # value is JSON-stringified (enumerateTuples): NaN→null per JSON
    assert ctx.call_map({"user": "a", "value": "x"})[0][1] == "null"
    ctx2 = TaskContext(
        "function(row) { return [[row.user, row.value + '!']]; }")
    # strings get quoted by JSON.stringify
    assert ctx2.call_map({"user": "a", "value": "x"})[0][1] == '"x!"'


def test_task_context_reduce_iter_protocol():
    from eventql_tpu.mapreduce.js_runtime import TaskContext

    ctx = TaskContext("""
    function(key, values) {
      var sum = 0;
      while (values.hasNext()) { sum += parseInt(values.next(), 10); }
      return [[key, sum]];
    }""")
    assert ctx.call_reduce("k", ["1", "2", "3"]) == [("k", "6")]


def test_task_context_globals_and_params():
    from eventql_tpu.mapreduce.js_runtime import TaskContext, encode_js

    interp = Interpreter()
    helper = interp.run("(function(x) { return x + 1; })")
    globals_json = encode_js(interp, JSObject({"inc": helper}))
    ctx = TaskContext(
        "function(row) { return [['k', inc(row.v) * params.scale]]; }",
        globals_json=globals_json,
        params_json='{"scale": 10}',
    )
    assert ctx.call_map({"v": 4}) == [("k", "50")]


def test_encode_decode_js_functions():
    from eventql_tpu.mapreduce.js_runtime import decode_js, encode_js

    interp = Interpreter()
    fn = interp.run("(function(a) { return a * 2; })")
    blob = encode_js(interp, JSObject({"f": fn, "n": 3.0}))
    revived = decode_js(Interpreter(), blob)
    assert revived.props["n"] == 3.0
    out = Interpreter().call(revived.props["f"], [5.0])
    assert out == 10.0


def test_job_context_builds_prelude_shaped_specs():
    from eventql_tpu.mapreduce.js_runtime import JobContext

    captured = {}

    def execute_tasks(tasks, root_id):
        captured["tasks"] = tasks
        captured["root"] = root_id

    ctx = JobContext(execute_tasks, lambda s: None)
    ctx.run("""
    var mapped = EVQL.mapTable({
      table: "events",
      map_fn: function(row) { return [[row.user, 1]]; },
      required_columns: ["user"],
    });
    var reduced = EVQL.reduce({
      sources: [mapped],
      shards: 2,
      reduce_fn: function(key, values) {
        var n = 0;
        while (values.hasNext()) { n += parseInt(values.next(), 10); }
        return [[key, n]];
      },
    });
    EVQL.downloadResults([reduced]);
    """)
    tasks = {t["id"]: t for t in captured["tasks"]}
    root = tasks[captured["root"]]
    assert root["op"] == "return_results"
    m = tasks["job-1"]
    assert m["op"] == "map_table"
    assert m["table_name"] == "events"
    assert m["map_fn"].startswith("function")
    assert m["required_columns"] == ["user"]
    r = tasks["job-2"]
    assert r["op"] == "reduce"
    assert r["num_shards"] == 2
    assert r["sources"] == ["job-1"]


def test_job_context_broadcast_and_z1_alias():
    from eventql_tpu.mapreduce.js_runtime import JobContext

    captured = {}
    ctx = JobContext(lambda t, r: captured.update(tasks=t), lambda s: None)
    ctx.run("""
    var factor = 3;
    function scale(x) { return x * factor_value; }
    var factor_value = 3;
    Z1.broadcast("factor_value");
    var m = Z1.mapTable({table: "t", map_fn: function(r){
      return [['k', scale(r.v)]]; }});
    Z1.downloadResults([m]);
    """)
    m = [t for t in captured["tasks"] if t["op"] == "map_table"][0]
    # broadcast globals include explicit vars and (auto) global functions
    assert "factor_value" in m["globals"]
    assert "scale" in m["globals"]


def test_job_context_errors():
    from eventql_tpu.core.errors import RuntimeError_
    from eventql_tpu.mapreduce.js_runtime import JobContext

    ctx = JobContext(lambda t, r: None, lambda s: None)
    with pytest.raises(RuntimeError_, match="missing parameter: table"):
        ctx.run("EVQL.mapTable({});")
    ctx2 = JobContext(lambda t, r: None, lambda s: None)
    with pytest.raises(RuntimeError_, match="sources must be an array"):
        ctx2.run("EVQL.downloadResults('nope');")


def test_write_to_output():
    from eventql_tpu.mapreduce.js_runtime import JobContext

    out = []
    ctx = JobContext(lambda t, r: None, out.append)
    ctx.run("EVQL.writeToOutput('hello');")
    assert out == ["hello"]
    with pytest.raises(Exception, match="must be a string"):
        ctx.run("EVQL.writeToOutput(42);")
