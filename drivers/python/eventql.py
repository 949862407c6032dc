"""eventql_tpu Python driver — thin HTTP-API client.

Mirrors the reference's python driver surface (reference:
drivers/python/, ~160 LoC thin client over /api/v1/sql). Standalone:
no dependency on the eventql_tpu package, stdlib only.

    import eventql
    conn = eventql.connect(host="localhost", port=9175,
                           auth_token="...")
    for row in conn.query("select 1;"):
        print(row)
    conn.insert("mytable", [{"time": 1, "value": 2}])
"""

from __future__ import annotations

import base64
import json
import urllib.error
import urllib.request
from typing import Dict, Iterator, List, Optional


class Error(Exception):
    pass


class ResultSet:
    def __init__(self, columns: List[str], rows: List[List[str]]):
        self.columns = columns
        self.rows = rows

    def __iter__(self) -> Iterator[Dict[str, str]]:
        for row in self.rows:
            yield dict(zip(self.columns, row))

    def __len__(self):
        return len(self.rows)


class Connection:
    def __init__(
        self,
        host: str = "localhost",
        port: int = 9175,
        database: str = "",
        auth_token: str = "",
        user: str = "",
        password: str = "",
        timeout: float = 60.0,
    ):
        self.base = f"http://{host}:{port}"
        self.database = database
        self.timeout = timeout
        self.headers = {"Content-Type": "application/json"}
        if auth_token:
            self.headers["Authorization"] = f"Token {auth_token}"
        elif user:
            cred = base64.b64encode(f"{user}:{password}".encode()).decode()
            self.headers["Authorization"] = f"Basic {cred}"

    def _post(self, path: str, payload) -> dict:
        req = urllib.request.Request(
            self.base + path,
            data=json.dumps(payload).encode(),
            headers=self.headers,
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:
            try:
                body = json.loads(e.read())
                raise Error(body.get("error", str(e)))
            except (ValueError, KeyError):
                raise Error(str(e))

    def query(self, sql: str) -> ResultSet:
        payload = {"query": sql}
        if self.database:
            payload["database"] = self.database
        out = self._post("/api/v1/sql", payload)
        if "error" in out:
            raise Error(out["error"])
        result = out["results"][0]
        return ResultSet(result.get("columns", []), result.get("rows", []))

    def execute(self, sql: str) -> List[ResultSet]:
        payload = {"query": sql}
        out = self._post("/api/v1/sql", payload)
        if "error" in out:
            raise Error(out["error"])
        return [
            ResultSet(r.get("columns", []), r.get("rows", []))
            for r in out["results"]
        ]

    def insert(self, table: str, records: List[dict]):
        payload = [
            {"table": table, "database": self.database, "data": r}
            for r in records
        ]
        self._post("/api/v1/tables/insert", payload)


def connect(**kwargs) -> Connection:
    return Connection(**kwargs)
