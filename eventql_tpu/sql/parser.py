"""Recursive-descent SQL parser.

A from-scratch re-implementation of the reference grammar
(reference: sql/parser/parser.cc, grammar notes in sql/bnf.txt) with
matching operator precedence and parse-error messages — the golden
suite checks error text verbatim (test/sql/00003).

Precedence (reference parser.cc:1505+):
  or=1, and=3, eq/neq/lt/lte/gt/gte/regex/like=6, add/sub=10,
  mul/div/mod=11, pow=12.
"""

from __future__ import annotations

from typing import List, Optional

from eventql_tpu.core.errors import ParseError, RuntimeError_
from eventql_tpu.sql.ast import ASTNode
from eventql_tpu.sql.tokens import Token, tokenize

_BINOP_INFO = {
    # ttype -> (ast type, precedence limit, rhs precedence, err name)
    "T_EQUAL": ("T_EQ_EXPR", 6, 6, "eqExpr"),
    "T_NEQUAL": ("T_NEQ_EXPR", 6, 6, "neqExpr"),
    "T_LT": ("T_LT_EXPR", 6, 6, "ltExpr"),
    "T_LTE": ("T_LTE_EXPR", 6, 6, "lteExpr"),
    "T_GT": ("T_GT_EXPR", 6, 6, "gtExpr"),
    "T_GTE": ("T_GTE_EXPR", 6, 6, "gteExpr"),
    "T_AND": ("T_AND_EXPR", 3, 3, "andExpr"),
    "T_OR": ("T_OR_EXPR", 1, 1, "orExpr"),
    "T_PLUS": ("T_ADD_EXPR", 10, 10, "addExpr"),
    "T_MINUS": ("T_SUB_EXPR", 10, 10, "subExpr"),
    "T_ASTERISK": ("T_MUL_EXPR", 11, 11, "mulExpr"),
    "T_SLASH": ("T_DIV_EXPR", 11, 11, "divExpr"),
    "T_DIV": ("T_DIV_EXPR", 11, 11, "divExpr"),
    "T_PERCENT": ("T_MOD_EXPR", 11, 11, "modExpr"),
    "T_MOD": ("T_MOD_EXPR", 11, 11, "modExpr"),
    # pow consumes rhs at precedence 11 in the reference (parser.cc:1735)
    "T_CIRCUMFLEX": ("T_POW_EXPR", 12, 11, "powExpr"),
    "T_REGEX": ("T_REGEX_EXPR", 6, 6, "REGEX operator"),
    "T_LIKE": ("T_LIKE_EXPR", 6, 6, "LIKE operator"),
}


class Parser:
    def __init__(self):
        self.tokens: List[Token] = []
        self.pos = 0

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def parse(self, query: str) -> List[ASTNode]:
        if len(query) == 0:
            raise ParseError("empty query")

        self.tokens = tokenize(query)
        if not self.tokens:
            raise RuntimeError_("SQL query doesn't contain any tokens")
        self.tokens.append(Token("T_EOF"))
        self.pos = 0

        stmts = []
        while self.cur().ttype != "T_EOF":
            stmts.append(self.statement())
        return stmts

    def parse_value_expression(self, text: str) -> ASTNode:
        self.tokens = tokenize(text)
        if not self.tokens:
            raise RuntimeError_("SQL value expression doesn't contain any tokens")
        self.tokens.append(Token("T_EOF"))
        self.pos = 0
        return self.expect_and_consume_value_expr()

    # ------------------------------------------------------------------
    # token helpers (reference: parser.h:176-239)
    # ------------------------------------------------------------------
    def cur(self) -> Token:
        return self.tokens[self.pos]

    def consume(self) -> Token:
        t = self.tokens[self.pos]
        self.pos += 1
        return t

    def consume_if(self, ttype: str) -> bool:
        if self.cur().ttype == ttype:
            self.pos += 1
            return True
        return False

    def lookahead(self, n: int, ttype: str) -> bool:
        return (
            self.pos + n < len(self.tokens) and self.tokens[self.pos + n].ttype == ttype
        )

    def assert_expectation(self, ttype: str):
        if self.cur().ttype != ttype:
            self._unexpected(f"expected: '{ttype}'")

    def expect_and_consume(self, ttype) -> Token:
        if isinstance(ttype, (list, tuple)):
            for cand in ttype:
                if self.cur().ttype == cand:
                    return self.consume()
            legal = ", ".join(ttype)
            self._unexpected(f"expected one of: {legal}")
        self.assert_expectation(ttype)
        return self.consume()

    def expect_and_consume_value_expr(self) -> ASTNode:
        e = self.expr()
        if e is None:
            self._unexpected("expected: value expression")
        return e

    def _unexpected(self, suffix: str):
        tok = self.cur()
        val = f": {tok.value}" if tok.value else ""
        raise ParseError(f"unexpected token {tok.ttype}{val}, {suffix}")

    # ------------------------------------------------------------------
    # statements (reference: parser.cc:312+)
    # ------------------------------------------------------------------
    def statement(self) -> ASTNode:
        t = self.cur().ttype
        if t == "T_SELECT":
            return self.select_statement()
        if t == "T_CREATE":
            return self.create_statement()
        if t == "T_DROP":
            return self.drop_table_statement()
        if t == "T_INSERT":
            self.consume()
            return self.insert_into_statement()
        if t == "T_ALTER":
            return self.alter_statement()
        if t == "T_DRAW":
            return self.draw_statement()
        if t == "T_IMPORT":
            return self.import_statement()
        if t == "T_SHOW":
            return self.show_statement()
        if t in ("T_DESCRIBE", "T_EXPLAIN"):
            return self.explain_statement()
        if t == "T_CLUSTER":
            return self.cluster_statement()
        if t == "T_USE":
            return self.use_statement()

        self._unexpected(
            "expected one of SELECT, CREATE, INSERT, ALTER, DROP, CLUSTER, "
            "DRAW or IMPORT"
        )

    def select_statement(self) -> ASTNode:
        select = ASTNode("T_SELECT")
        self.consume()

        select_list = select.append("T_SELECT_LIST")
        if self.cur().ttype == "T_ASTERISK":
            select_list.append("T_ALL")
            self.consume()
        else:
            while True:
                select_list.append(self.select_sublist())
                if not self.consume_if("T_COMMA"):
                    break

        if self.cur().ttype not in ("T_SEMICOLON", "T_RPAREN"):
            select.append(self.from_clause())

        w = self.where_clause()
        if w is not None:
            select.append(w)
        g = self.group_by_clause()
        if g is not None:
            select.append(g)
        h = self.having_clause()
        if h is not None:
            select.append(h)
        o = self.order_by_clause()
        if o is not None:
            select.append(o)
        li = self.limit_clause()
        if li is not None:
            select.append(li)

        self.consume_if("T_SEMICOLON")
        return select

    def select_sublist(self) -> ASTNode:
        # table_name.*
        if (
            self.lookahead(0, "T_IDENTIFIER")
            and self.lookahead(1, "T_DOT")
            and self.lookahead(2, "T_ASTERISK")
        ):
            select_all = ASTNode("T_ALL", self.cur())
            self.pos += 3
            return select_all

        derived = ASTNode("T_DERIVED_COLUMN")
        derived.append(self.expect_and_consume_value_expr())

        if self.consume_if("T_AS"):
            self.assert_expectation("T_IDENTIFIER")

        if self.cur().ttype == "T_IDENTIFIER":
            alias = derived.append("T_COLUMN_ALIAS")
            alias.token = self.consume()

        return derived

    def from_clause(self) -> ASTNode:
        self.assert_expectation("T_FROM")
        self.consume()
        return self.table_reference()

    def table_reference(self) -> ASTNode:
        base = self.table_factor()
        return self.join_expression(base)

    def join_expression(self, base: ASTNode) -> ASTNode:
        natural = False
        if self.cur().ttype == "T_NATURAL":
            self.consume()
            natural = True

        t = self.cur().ttype

        if t == "T_COMMA":
            join = ASTNode("T_INNER_JOIN")
            self.consume()
            join.append(base)
            join.append(self.table_factor())
            return self.join_expression(join)

        if t in ("T_CROSS", "T_INNER"):
            self.consume()
            t = self.cur().ttype

        if t == "T_JOIN":
            join = ASTNode("T_NATURAL_INNER_JOIN" if natural else "T_INNER_JOIN")
            self.consume()
            join.append(base)
            join.append(self.table_factor())
            if not natural:
                cond = self.join_condition()
                if cond is not None:
                    join.append(cond)
            return self.join_expression(join)

        if t in ("T_LEFT", "T_RIGHT"):
            if t == "T_LEFT":
                jt = "T_NATURAL_LEFT_JOIN" if natural else "T_LEFT_JOIN"
            else:
                jt = "T_NATURAL_RIGHT_JOIN" if natural else "T_RIGHT_JOIN"
            self.consume()
            self.consume_if("T_OUTER")
            self.expect_and_consume("T_JOIN")
            join = ASTNode(jt)
            join.append(base)
            join.append(self.table_factor())
            if not natural:
                cond = self.join_condition()
                if cond is None:
                    raise ParseError("LEFT/RIGHT JOIN needs a JOIN CONDITION")
                join.append(cond)
            return self.join_expression(join)

        return base

    def join_condition(self) -> Optional[ASTNode]:
        t = self.cur().ttype
        if t == "T_ON":
            self.consume()
            cond = ASTNode("T_JOIN_CONDITION")
            cond.append(self.expect_and_consume_value_expr())
            return cond
        if t == "T_USING":
            self.consume()
            self.expect_and_consume("T_LPAREN")
            cond = ASTNode("T_JOIN_COLUMNLIST")
            while True:
                cond.append(self.column_name())
                if not self.consume_if("T_COMMA"):
                    break
            self.expect_and_consume("T_RPAREN")
            return cond
        return None

    def table_factor(self) -> ASTNode:
        base = ASTNode("T_FROM")

        if self.cur().ttype == "T_LPAREN":
            self.consume()
            if self.cur().ttype == "T_SELECT":
                base.append(self.select_statement())
                self.expect_and_consume("T_RPAREN")
            else:
                table_ref = self.table_reference()
                self.expect_and_consume("T_RPAREN")
                return table_ref
        else:
            base.append(self.table_name())

        self.consume_if("T_AS")

        if self.cur().ttype == "T_IDENTIFIER":
            alias = base.append("T_TABLE_ALIAS")
            alias.token = self.consume()

        return base

    def where_clause(self) -> Optional[ASTNode]:
        if not self.consume_if("T_WHERE"):
            return None
        clause = ASTNode("T_WHERE")
        clause.append(self.expr())
        return clause

    def group_by_clause(self) -> Optional[ASTNode]:
        if not self.consume_if("T_GROUP"):
            return None
        self.expect_and_consume("T_BY")
        clause = ASTNode("T_GROUP_BY")
        while True:
            clause.append(self.expr())
            if not self.consume_if("T_COMMA"):
                break
        return clause

    def having_clause(self) -> Optional[ASTNode]:
        if not self.consume_if("T_HAVING"):
            return None
        clause = ASTNode("T_HAVING")
        clause.append(self.expr())
        return clause

    def order_by_clause(self) -> Optional[ASTNode]:
        if not self.consume_if("T_ORDER"):
            return None
        self.expect_and_consume("T_BY")
        clause = ASTNode("T_ORDER_BY")
        while True:
            spec = clause.append("T_SORT_SPEC")
            spec.append(self.expr())
            if self.cur().ttype in ("T_ASC", "T_DESC"):
                spec.token = self.consume()
            if not self.consume_if("T_COMMA"):
                break
        return clause

    def limit_clause(self) -> Optional[ASTNode]:
        if not self.consume_if("T_LIMIT"):
            return None
        self.assert_expectation("T_NUMERIC")
        clause = ASTNode("T_LIMIT", self.consume())
        if self.consume_if("T_OFFSET"):
            self.assert_expectation("T_NUMERIC")
            offset = clause.append("T_OFFSET")
            offset.token = self.consume()
        return clause

    def table_name(self) -> ASTNode:
        if self.cur().ttype not in ("T_IDENTIFIER", "T_STRING"):
            self.assert_expectation("T_IDENTIFIER")
        name_str = self.consume().value
        while self.lookahead(0, "T_DOT"):
            self.consume()
            self.assert_expectation("T_IDENTIFIER")
            name_str += "." + self.cur().value
            self.consume()
        return ASTNode("T_TABLE_NAME", Token("T_IDENTIFIER", name_str))

    # ------------------------------------------------------------------
    # DDL / DML statements
    # ------------------------------------------------------------------
    def create_statement(self) -> ASTNode:
        self.consume()
        t = self.cur().ttype
        if t == "T_TABLE":
            return self.create_table_statement()
        if t == "T_DATABASE":
            return self.create_database_statement()
        self._unexpected("expected one of SELECT, DRAW or IMPORT")

    def create_table_statement(self) -> ASTNode:
        self.expect_and_consume("T_TABLE")
        create_table = ASTNode("T_CREATE_TABLE")
        create_table.append(self.table_name())
        column_list = create_table.append("T_COLUMN_LIST")
        self.expect_and_consume("T_LPAREN")
        while self.cur().ttype != "T_RPAREN":
            if self.cur().ttype == "T_PRIMARY":
                column_list.append(self.primary_key_definition())
            elif self.cur().ttype == "T_PARTITION":
                column_list.append(self.partition_key_definition())
            else:
                coldef = self.column_definition()
                if self.cur().ttype == "T_PRIMARY":
                    self.consume()
                    self.expect_and_consume("T_KEY")
                    coldef.append("T_PRIMARY_KEY")
                column_list.append(coldef)
            if not self.consume_if("T_COMMA"):
                break
        self.expect_and_consume("T_RPAREN")

        if self.cur().ttype == "T_WITH":
            self.consume()
            plist = create_table.append("T_TABLE_PROPERTY_LIST")
            while self.cur().ttype != "T_SEMICOLON":
                plist.append(self.table_property_definition())
                if not self.consume_if("T_AND"):
                    break

        self.consume_if("T_SEMICOLON")
        return create_table

    def column_definition(self) -> ASTNode:
        column = ASTNode("T_COLUMN")
        self.assert_expectation("T_IDENTIFIER")
        cname = column.append("T_COLUMN_NAME")
        cname.token = self.consume()

        repeated = False
        if self.cur().ttype == "T_REPEATED":
            repeated = True
            self.consume()

        if self.cur().ttype == "T_RECORD":
            self.consume()
            record_def = column.append("T_RECORD")
            self.expect_and_consume("T_LPAREN")
            while self.cur().ttype != "T_RPAREN":
                record_def.append(self.column_definition())
                if not self.consume_if("T_COMMA"):
                    break
            self.expect_and_consume("T_RPAREN")
        else:
            ctype = column.append("T_COLUMN_TYPE")
            ctype.token = self.consume()
            if self.cur().ttype == "T_NOT":
                self.consume()
                self.expect_and_consume("T_NULL")
                column.append("T_NOT_NULL")

        if repeated:
            column.append("T_REPEATED")
        return column

    def primary_key_definition(self) -> ASTNode:
        self.consume()
        self.expect_and_consume("T_KEY")
        pk = ASTNode("T_PRIMARY_KEY")
        self.expect_and_consume("T_LPAREN")
        while self.cur().ttype != "T_RPAREN":
            pk.append(self.column_name())
            if not self.consume_if("T_COMMA"):
                break
        self.expect_and_consume("T_RPAREN")
        return pk

    def partition_key_definition(self) -> ASTNode:
        self.consume()
        self.expect_and_consume("T_KEY")
        pk = ASTNode("T_PARTITION_KEY")
        self.expect_and_consume("T_LPAREN")
        pk.append(self.column_name())
        self.expect_and_consume("T_RPAREN")
        return pk

    def table_property_definition(self) -> ASTNode:
        prop = ASTNode("T_TABLE_PROPERTY")
        if self.cur().ttype not in ("T_IDENTIFIER", "T_STRING"):
            self.assert_expectation("T_IDENTIFIER")
        name_str = self.consume().value
        while self.lookahead(0, "T_DOT"):
            self.consume()
            self.assert_expectation("T_IDENTIFIER")
            name_str += "." + self.cur().value
            self.consume()
        key = prop.append("T_TABLE_PROPERTY_KEY")
        key.token = Token("T_IDENTIFIER", name_str)
        self.expect_and_consume("T_EQUAL")
        if self.cur().ttype not in ("T_STRING", "T_NUMERIC", "T_TRUE", "T_FALSE"):
            self.assert_expectation("T_STRING")
        val = prop.append("T_TABLE_PROPERTY_VALUE")
        val.token = self.consume()
        return prop

    def create_database_statement(self) -> ASTNode:
        self.expect_and_consume("T_DATABASE")
        node = ASTNode("T_CREATE_DATABASE")
        name = node.append("T_DATABASE_NAME")
        name.token = self.consume()
        self.consume_if("T_SEMICOLON")
        return node

    def drop_table_statement(self) -> ASTNode:
        self.consume()
        self.expect_and_consume("T_TABLE")
        node = ASTNode("T_DROP_TABLE")
        node.append(self.table_name())
        self.consume_if("T_SEMICOLON")
        return node

    def insert_into_statement(self) -> ASTNode:
        self.consume_if("T_INTO")
        node = ASTNode("T_INSERT_INTO")
        node.append(self.table_name())

        t = self.cur().ttype
        if t == "T_FROM":
            self.consume()
            self.expect_and_consume("T_JSON")
            self.assert_expectation("T_STRING")
            json_node = ASTNode("T_JSON_STRING", self.cur())
            self.consume()
            node.append(json_node)
        elif t == "T_LPAREN":
            node.append(self.insert_column_list())
            node.append(self.insert_value_list())
        elif t == "T_VALUES":
            node.append(ASTNode("T_COLUMN_LIST"))
            node.append(self.insert_value_list())
        else:
            raise ParseError(
                f"unexpected Token {self.cur().value}, can't build expression"
            )

        self.consume_if("T_SEMICOLON")
        return node

    def insert_column_list(self) -> ASTNode:
        self.expect_and_consume("T_LPAREN")
        column_list = ASTNode("T_COLUMN_LIST")
        while self.cur().ttype != "T_RPAREN":
            self.assert_expectation("T_IDENTIFIER")
            cname = column_list.append("T_COLUMN_NAME")
            cname.token = self.consume()
            if not self.consume_if("T_COMMA"):
                break
        self.expect_and_consume("T_RPAREN")
        return column_list

    def insert_value_list(self) -> ASTNode:
        self.expect_and_consume("T_VALUES")
        self.expect_and_consume("T_LPAREN")
        value_list = ASTNode("T_VALUE_LIST")
        while self.cur().ttype != "T_RPAREN":
            value = self.expr()
            if value is None:
                raise ParseError(
                    f"unexpected Token {self.cur().value}, can't build expression"
                )
            value_list.append(value)
            if not self.consume_if("T_COMMA"):
                break
        self.expect_and_consume("T_RPAREN")
        return value_list

    def nested_column_name(self) -> ASTNode:
        self.assert_expectation("T_IDENTIFIER")
        name_str = self.consume().value
        while self.lookahead(0, "T_DOT"):
            self.consume()
            self.assert_expectation("T_IDENTIFIER")
            name_str += "." + self.cur().value
            self.consume()
        return ASTNode("T_COLUMN_NAME", Token("T_IDENTIFIER", name_str))

    def alter_statement(self) -> ASTNode:
        self.consume()
        self.expect_and_consume("T_TABLE")
        node = ASTNode("T_ALTER_TABLE")
        node.append(self.table_name())

        while self.cur().ttype != "T_SEMICOLON":
            t = self.cur().ttype
            if t == "T_ADD":
                self.consume()
                self.consume_if("T_COLUMN")
                node.append(self.add_column_definition())
            elif t == "T_DROP":
                self.consume()
                self.consume_if("T_COLUMN")
                node.append(self.nested_column_name())
            elif t == "T_SET":
                self.consume()
                self.expect_and_consume("T_PROPERTY")
                node.append(self.table_property_definition())
            else:
                self._unexpected("expected one of ADD or DROP")
            if not self.consume_if("T_COMMA"):
                break

        self.consume_if("T_SEMICOLON")
        return node

    def add_column_definition(self) -> ASTNode:
        column = ASTNode("T_COLUMN")
        column.append(self.nested_column_name())
        repeated = False
        if self.cur().ttype == "T_REPEATED":
            repeated = True
            self.consume()
        if self.cur().ttype == "T_RECORD":
            column.append("T_RECORD")
            self.consume()
        else:
            ctype = column.append("T_COLUMN_TYPE")
            ctype.token = self.consume()
        if self.cur().ttype == "T_NOT":
            self.consume()
            self.expect_and_consume("T_NULL")
            column.append("T_NOT_NULL")
        if repeated:
            column.append("T_REPEATED")
        return column

    def import_statement(self) -> ASTNode:
        node = ASTNode("T_IMPORT")
        self.consume()
        self.expect_and_consume("T_TABLE")
        node.append(self.table_name())
        if self.cur().ttype == "T_COMMA":
            self.consume()
            node.append(self.table_name())
        self.expect_and_consume("T_FROM")
        node.append(self.expect_and_consume_value_expr())
        self.consume_if("T_SEMICOLON")
        return node

    def show_statement(self) -> ASTNode:
        self.consume()
        self.expect_and_consume("T_TABLES")
        node = ASTNode("T_SHOW_TABLES")
        self.consume_if("T_SEMICOLON")
        return node

    def explain_statement(self) -> ASTNode:
        self.consume()
        t = self.cur().ttype
        if t == "T_SELECT":
            node = ASTNode("T_EXPLAIN_QUERY")
            node.append(self.select_statement())
            self.consume_if("T_SEMICOLON")
            return node
        if t == "T_PARTITIONS":
            self.consume()
            node = ASTNode("T_DESCRIBE_PARTITIONS")
            node.append(self.table_name())
            self.consume_if("T_SEMICOLON")
            return node
        node = ASTNode("T_DESCRIBE_TABLE")
        node.append(self.table_name())
        self.consume_if("T_SEMICOLON")
        return node

    def cluster_statement(self) -> ASTNode:
        self.consume()
        self.expect_and_consume("T_SHOW")
        self.expect_and_consume("T_SERVERS")
        node = ASTNode("T_CLUSTER_SHOW_SERVERS")
        self.consume_if("T_SEMICOLON")
        return node

    def use_statement(self) -> ASTNode:
        self.consume()
        node = ASTNode("T_USE_DATABASE")
        name = node.append("T_DATABASE_NAME")
        name.token = self.consume()
        self.consume_if("T_SEMICOLON")
        return node

    # ------------------------------------------------------------------
    # DRAW statements (ChartSQL; reference parser.cc:975+)
    # ------------------------------------------------------------------
    def draw_statement(self) -> ASTNode:
        chart = ASTNode("T_DRAW")
        self.consume()
        chart.token = self.expect_and_consume(
            [
                "T_AREACHART",
                "T_BARCHART",
                "T_HEATMAP",
                "T_HISTOGRAM",
                "T_POINTCHART",
                "T_LINECHART",
            ]
        )
        self.consume_if("T_WITH")

        while self.cur().ttype != "T_SEMICOLON":
            t = self.cur().ttype
            if t == "T_AXIS":
                chart.append(self.axis_clause())
            elif t in ("T_XDOMAIN", "T_YDOMAIN", "T_ZDOMAIN"):
                chart.append(self.domain_clause())
            elif t == "T_LEGEND":
                chart.append(self.legend_clause())
            elif t == "T_GRID":
                grid = chart.append("T_GRID")
                self.consume()
                for _ in range(2):
                    if self.cur().ttype in ("T_HORIZONTAL", "T_VERTICAL"):
                        prop = grid.append("T_PROPERTY")
                        prop.token = self.consume()
                    else:
                        break
            elif t == "T_ORIENTATION":
                prop = chart.append("T_PROPERTY")
                prop.token = self.consume()
                val = prop.append("T_PROPERTY_VALUE")
                val.token = self.expect_and_consume(["T_HORIZONTAL", "T_VERTICAL"])
            elif t in ("T_STACKED", "T_LABELS"):
                prop = chart.append("T_PROPERTY")
                prop.token = self.consume()
                prop.append("T_PROPERTY_VALUE")
            elif t in ("T_TITLE", "T_SUBTITLE"):
                prop = chart.append("T_PROPERTY")
                prop.token = self.consume()
                prop.append(self.expect_and_consume_value_expr())
            else:
                self._unexpected_bare()

        self.consume_if("T_SEMICOLON")
        return chart

    def _unexpected_bare(self):
        tok = self.cur()
        val = f": {tok.value}" if tok.value else ""
        raise ParseError(f"unexpected token {tok.ttype}{val}")

    def axis_clause(self) -> ASTNode:
        axis = ASTNode("T_AXIS", self.consume())
        if self.cur().ttype in ("T_TOP", "T_RIGHT", "T_BOTTOM", "T_LEFT"):
            pos = axis.append("T_AXIS_POSITION")
            pos.token = self.consume()
        else:
            self._unexpected("expected one of TOP, RIGHT, BOTTOM, LEFT")

        while self.cur().ttype != "T_SEMICOLON":
            t = self.cur().ttype
            if t == "T_TITLE":
                title = axis.append("T_PROPERTY")
                title.token = self.consume()
                title.append(self.expect_and_consume_value_expr())
                continue
            if t == "T_TICKS":
                labels = axis.append("T_AXIS_LABELS")
                self.consume()
                for _ in range(2):
                    tt = self.cur().ttype
                    if tt in ("T_INSIDE", "T_OUTSIDE", "T_OFF"):
                        prop = labels.append("T_PROPERTY")
                        prop.token = self.consume()
                    elif tt == "T_ROTATE":
                        prop = labels.append("T_PROPERTY")
                        prop.token = self.consume()
                        prop.append(self.expect_and_consume_value_expr())
                continue
            break

        return axis

    def domain_clause(self) -> ASTNode:
        domain = ASTNode("T_DOMAIN", self.consume())
        min_expr = self.expr()
        if min_expr is not None:
            self.expect_and_consume("T_COMMA")
            scale = domain.append("T_DOMAIN_SCALE")
            scale.append(min_expr)
            scale.append(self.expect_and_consume_value_expr())
        for _ in range(2):
            if self.cur().ttype in ("T_INVERT", "T_LOGARITHMIC"):
                prop = domain.append("T_PROPERTY")
                prop.token = self.consume()
                prop.append("T_PROPERTY_VALUE")
            else:
                break
        return domain

    def legend_clause(self) -> ASTNode:
        legend = ASTNode("T_LEGEND")
        self.consume()
        for _ in range(3):
            prop = legend.append("T_PROPERTY")
            prop.token = self.expect_and_consume(
                ["T_TOP", "T_RIGHT", "T_BOTTOM", "T_LEFT", "T_INSIDE", "T_OUTSIDE"]
            )
        if self.cur().ttype == "T_TITLE":
            prop = legend.append("T_PROPERTY")
            prop.token = self.consume()
            prop.append(self.expect_and_consume_value_expr())
        return legend

    # ------------------------------------------------------------------
    # expressions (reference: parser.cc:97-231, precedence climbing)
    # ------------------------------------------------------------------
    def expr(self, precedence: int = 0) -> Optional[ASTNode]:
        lhs = self.unary_expr()
        if lhs is None:
            return None
        while True:
            e = self.binary_expr(lhs, precedence)
            if e is None:
                return lhs
            lhs = e

    def unary_expr(self) -> Optional[ASTNode]:
        t = self.cur().ttype

        if t == "T_LPAREN":
            self.consume()
            e = self.expr()
            self.assert_expectation("T_RPAREN")
            self.consume()
            return e

        if t in ("T_BANG", "T_MINUS", "T_NOT"):
            self.consume()
            e = ASTNode("T_NEGATE_EXPR")
            e.append(self.expr())
            return e

        if t in ("T_TRUE", "T_FALSE", "T_NUMERIC", "T_STRING", "T_NULL"):
            e = ASTNode("T_LITERAL", self.cur())
            self.consume()
            return e

        if t == "T_IDENTIFIER":
            return self.column_name()

        return None

    def column_name(self) -> ASTNode:
        self.assert_expectation("T_IDENTIFIER")

        if self.lookahead(1, "T_DOT"):
            # table_name.column_name[.column_name...] as a chain of
            # T_COLUMN_NAME nodes (reference parser.cc:162-179)
            col_name = ASTNode("T_COLUMN_NAME", self.cur())
            cur = col_name
            self.consume()
            while True:
                self.consume()  # the dot
                self.assert_expectation("T_IDENTIFIER")
                nxt = cur.append("T_COLUMN_NAME")
                nxt.token = self.cur()
                cur = nxt
                self.consume()
                if not self.lookahead(0, "T_DOT"):
                    break
            return col_name

        if self.lookahead(1, "T_LPAREN"):
            return self.method_call()

        e = ASTNode("T_COLUMN_NAME", self.cur())
        self.consume()
        return e

    def method_call(self) -> ASTNode:
        e = ASTNode("T_METHOD_CALL", self.consume())

        if e.token.value == "if":
            e.ntype = "T_IF_EXPR"
        if e.token.value == "subquery_column":
            e.ntype = "T_COLUMN_INDEX"

        while True:
            self.consume()  # lparen or comma
            if self.cur().ttype == "T_ASTERISK":
                e.append("T_VOID")
                self.consume()
            elif self.cur().ttype == "T_RPAREN":
                break
            else:
                e.append(self.expr())
            if self.cur().ttype != "T_COMMA":
                break

        self.expect_and_consume("T_RPAREN")

        if self.lookahead(0, "T_WITHIN") and self.lookahead(1, "T_RECORD"):
            self.consume()
            self.consume()
            e.ntype = "T_METHOD_CALL_WITHIN_RECORD"

        return e

    def binary_expr(self, lhs: ASTNode, precedence: int) -> Optional[ASTNode]:
        info = _BINOP_INFO.get(self.cur().ttype)
        if info is None:
            return None
        ast_type, prec_limit, rhs_prec, err_name = info
        if precedence >= prec_limit:
            return None
        self.consume()
        rhs = self.expr(rhs_prec)
        if rhs is None:
            if ast_type == "T_EQ_EXPR":
                raise RuntimeError_(
                    "eqExpr needs second argument. Did you type '==' instead of '='?"
                )
            raise RuntimeError_(f"{err_name} needs second argument")
        e = ASTNode(ast_type)
        e.append(lhs)
        e.append(rhs)
        return e
