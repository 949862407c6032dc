"""SQL tokenizer.

A faithful re-implementation of the reference's hand-written lexer
(reference: sql/parser/tokenize.cc, sql/parser/token.h/.cc), since
token type names appear verbatim in user-facing parse errors that the
golden test suite checks (e.g. "unexpected token T_SEMICOLON, ...").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

# Token type names are the user-visible strings from Token::getTypeName
# (reference: sql/parser/token.cc:62+). We just use the string itself as
# the type id.

# single source of truth for keyword → token type (reference:
# tokenize.cc:330+; comparison is case-insensitive, token.cc:179-185)
KEYWORDS = {
    "AS": "T_AS",
    "ASC": "T_ASC",
    "DESC": "T_DESC",
    "NOT": "T_NOT",
    "NULL": "T_NULL",
    "TRUE": "T_TRUE",
    "FALSE": "T_FALSE",
    "SELECT": "T_SELECT",
    "FROM": "T_FROM",
    "WHERE": "T_WHERE",
    "GROUP": "T_GROUP",
    "ORDER": "T_ORDER",
    "BY": "T_BY",
    "HAVING": "T_HAVING",
    "AND": "T_AND",
    "OR": "T_OR",
    "LIMIT": "T_LIMIT",
    "OFFSET": "T_OFFSET",
    "CREATE": "T_CREATE",
    "WITH": "T_WITH",
    "LIKE": "T_LIKE",
    "REGEX": "T_REGEX",
    "REGEXP": "T_REGEX",
    "BEGIN": "T_BEGIN",
    "WITHIN": "T_WITHIN",
    "RECORD": "T_RECORD",
    "MOD": "T_MOD",
    "DRAW": "T_DRAW",
    "TOP": "T_TOP",
    "RIGHT": "T_RIGHT",
    "BOTTOM": "T_BOTTOM",
    "LEFT": "T_LEFT",
    "IMPORT": "T_IMPORT",
    "TABLE": "T_TABLE",
    "TABLES": "T_TABLES",
    "DATABASE": "T_DATABASE",
    "USE": "T_USE",
    "AXIS": "T_AXIS",
    "BARCHART": "T_BARCHART",
    "LINECHART": "T_LINECHART",
    "AREACHART": "T_AREACHART",
    "POINTCHART": "T_POINTCHART",
    "HEATMAP": "T_HEATMAP",
    "HISTOGRAM": "T_HISTOGRAM",
    "ORIENTATION": "T_ORIENTATION",
    "HORIZONTAL": "T_HORIZONTAL",
    "VERTICAL": "T_VERTICAL",
    "STACKED": "T_STACKED",
    "ON": "T_ON",
    "OFF": "T_OFF",
    "SHOW": "T_SHOW",
    "DESCRIBE": "T_DESCRIBE",
    "EXPLAIN": "T_EXPLAIN",
    "PARTITIONS": "T_PARTITIONS",
    "CLUSTER": "T_CLUSTER",
    "SERVERS": "T_SERVERS",
    "PRIMARY": "T_PRIMARY",
    "PARTITION": "T_PARTITION",
    "KEY": "T_KEY",
    "JOIN": "T_JOIN",
    "CROSS": "T_CROSS",
    "NATURAL": "T_NATURAL",
    "INNER": "T_INNER",
    "OUTER": "T_OUTER",
    "USING": "T_USING",
    "REPEATED": "T_REPEATED",
    "INSERT": "T_INSERT",
    "INTO": "T_INTO",
    "VALUES": "T_VALUES",
    "JSON": "T_JSON",
    "ALTER": "T_ALTER",
    "ADD": "T_ADD",
    "DROP": "T_DROP",
    "COLUMN": "T_COLUMN",
    "SET": "T_SET",
    "PROPERTY": "T_PROPERTY",
    "XDOMAIN": "T_XDOMAIN",
    "YDOMAIN": "T_YDOMAIN",
    "ZDOMAIN": "T_ZDOMAIN",
    "LOGARITHMIC": "T_LOGARITHMIC",
    "INVERT": "T_INVERT",
    "TITLE": "T_TITLE",
    "SUBTITLE": "T_SUBTITLE",
    "GRID": "T_GRID",
    "LABELS": "T_LABELS",
    "TICKS": "T_TICKS",
    "INSIDE": "T_INSIDE",
    "OUTSIDE": "T_OUTSIDE",
    "ROTATE": "T_ROTATE",
    "LEGEND": "T_LEGEND",
    "OVER": "T_OVER",
    "TIMEWINDOW": "T_TIMEWINDOW",
}

# characters that terminate an identifier (reference: tokenize.cc:268-295)
_IDENT_TERMINATORS = set(" \t\n\r,.;()\"'`=+-*!/^~%&|<>")


@dataclass
class Token:
    ttype: str
    value: str = ""

    def __repr__(self):
        return f"Token({self.ttype}, {self.value!r})"


def tokenize(query: str) -> List[Token]:
    """Tokenize a query string (reference: tokenizeQuery, tokenize.cc:31)."""
    out: List[Token] = []
    cur = 0
    end = len(query)

    single = {
        ";": "T_SEMICOLON",
        ",": "T_COMMA",
        ".": "T_DOT",
        "(": "T_LPAREN",
        ")": "T_RPAREN",
    }

    while True:
        while cur < end and query[cur] in " \t\n\r":
            cur += 1
        if cur >= end:
            return out

        c = query[cur]

        if c in single:
            out.append(Token(single[c]))
            cur += 1
            continue

        if c.isdigit():
            begin = cur
            while cur < end and (query[cur].isdigit() or query[cur] == "."):
                cur += 1
            out.append(Token("T_NUMERIC", query[begin:cur]))
            continue

        if c in "`\"'":
            # quoted string / quoted identifier (backtick)
            string_type = "T_IDENTIFIER" if c == "`" else "T_STRING"
            quote_char = c
            cur += 1
            buf = []
            escaped = False
            while cur < end:
                chr_ = query[cur]
                if chr_ in "\"'`":
                    if escaped or quote_char != chr_:
                        buf.append(chr_)
                        escaped = False
                        cur += 1
                        continue
                    cur += 1
                    break
                if chr_ == "\\":
                    if escaped:
                        buf.append("\\")
                        escaped = False
                    else:
                        escaped = True
                    cur += 1
                    continue
                buf.append(chr_)
                escaped = False
                cur += 1
            out.append(Token(string_type, "".join(buf)))
            continue

        if c == "=":
            out.append(Token("T_EQUAL"))
            cur += 1
            continue
        if c == "+":
            out.append(Token("T_PLUS"))
            cur += 1
            continue
        if c == "-":
            if cur + 1 < end and query[cur + 1] == "-":
                # -- comment until end of line
                while cur < end and query[cur] != "\n":
                    cur += 1
                continue
            out.append(Token("T_MINUS"))
            cur += 1
            continue
        if c == "*":
            out.append(Token("T_ASTERISK"))
            cur += 1
            continue
        if c == "!":
            if cur + 1 < end and query[cur + 1] == "=":
                out.append(Token("T_NEQUAL"))
                cur += 2
                continue
            out.append(Token("T_BANG"))
            cur += 1
            continue
        if c == "/":
            out.append(Token("T_SLASH"))
            cur += 1
            continue
        if c == "^":
            out.append(Token("T_CIRCUMFLEX"))
            cur += 1
            continue
        if c == "~":
            out.append(Token("T_TILDE"))
            cur += 1
            continue
        if c == "%":
            out.append(Token("T_PERCENT"))
            cur += 1
            continue
        if c == "&":
            out.append(Token("T_AMPERSAND"))
            cur += 1
            continue
        if c == "|":
            out.append(Token("T_PIPE"))
            cur += 1
            continue
        if c == "<":
            if cur + 1 < end and query[cur + 1] == "=":
                out.append(Token("T_LTE"))
                cur += 2
                continue
            out.append(Token("T_LT"))
            cur += 1
            continue
        if c == ">":
            if cur + 1 < end and query[cur + 1] == "=":
                out.append(Token("T_GTE"))
                cur += 2
                continue
            out.append(Token("T_GT"))
            cur += 1
            continue

        # identifier / keyword
        begin = cur
        while cur < end and query[cur] not in _IDENT_TERMINATORS:
            cur += 1
        word = query[begin:cur]
        kw = KEYWORDS.get(word.upper())
        if kw is not None:
            out.append(Token(kw))
        else:
            out.append(Token("T_IDENTIFIER", word))
        continue
