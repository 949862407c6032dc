"""Generic AST node (reference: sql/parser/astnode.h/.cc).

The parser produces a generic tree of (type, token, children); the
query-plan builder (eventql_tpu.plan.builder) turns it into typed
logical-plan nodes.
"""

from __future__ import annotations

from typing import List, Optional

from eventql_tpu.sql.tokens import Token


class ASTNode:
    def __init__(self, ntype: str, token: Optional[Token] = None):
        self.ntype = ntype
        self.token = token
        self.children: List["ASTNode"] = []

    def append(self, child) -> "ASTNode":
        if isinstance(child, str):
            child = ASTNode(child)
        self.children.append(child)
        return child

    def append_at(self, child: "ASTNode", idx: int) -> "ASTNode":
        self.children.insert(idx, child)
        return child

    def remove_children_by_type(self, ntype: str):
        self.children = [c for c in self.children if c.ntype != ntype]

    def remove_child_at(self, idx: int):
        del self.children[idx]

    def find_first(self, ntype: str) -> Optional["ASTNode"]:
        for c in self.children:
            if c.ntype == ntype:
                return c
        return None

    def deep_copy(self) -> "ASTNode":
        n = ASTNode(self.ntype, self.token)
        n.children = [c.deep_copy() for c in self.children]
        return n

    def __repr__(self):
        t = f" {self.token!r}" if self.token else ""
        return f"<{self.ntype}{t} ({len(self.children)} children)>"

    def debug_string(self, indent: int = 0) -> str:
        s = "  " * indent + repr(self) + "\n"
        for c in self.children:
            s += c.debug_string(indent + 1)
        return s
