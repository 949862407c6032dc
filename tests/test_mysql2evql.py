"""mysql2evql importer tests (reference: tools/mysql2evql.cc — schema
mapping + batched upload; this port consumes mysqldump files)."""

import subprocess
import sys

import pytest

from eventql_tpu.cli.mysql2evql import (
    map_type,
    parse_create_table,
    parse_inserts,
)
from eventql_tpu.db.table_service import TableService
from eventql_tpu.server.native_tcp import NativeTCPClient, NativeTCPServer

DUMP = """
-- MySQL dump 10.13
DROP TABLE IF EXISTS `users`;
CREATE TABLE `users` (
  `id` bigint(20) NOT NULL AUTO_INCREMENT,
  `name` varchar(255) DEFAULT NULL,
  `score` double DEFAULT NULL,
  `active` tinyint(1) DEFAULT '1',
  `created` datetime DEFAULT NULL,
  PRIMARY KEY (`id`),
  KEY `idx_name` (`name`)
) ENGINE=InnoDB DEFAULT CHARSET=utf8;

LOCK TABLES `users` WRITE;
INSERT INTO `users` VALUES (1,'alice',9.5,1,'2020-01-01 00:00:00'),(2,'bob, the \\'builder\\'',NULL,0,'2020-06-15 12:30:00');
INSERT INTO `users` VALUES (3,'carol (x)',7.25,1,NULL);
UNLOCK TABLES;
"""


def test_type_mapping():
    assert map_type("bigint(20)") == "uint64"
    assert map_type("varchar(255)") == "string"
    assert map_type("double") == "double"
    assert map_type("tinyint(1)") == "boolean"
    assert map_type("datetime") == "datetime"
    assert map_type("longtext") == "string"


def test_parse_create_table():
    cols, pk = parse_create_table(DUMP, "users")
    assert cols == [
        ("id", "uint64"),
        ("name", "string"),
        ("score", "double"),
        ("active", "boolean"),
        ("created", "datetime"),
    ]
    assert pk == ["id"]


def test_parse_inserts_quotes_and_nulls():
    cols, _ = parse_create_table(DUMP, "users")
    records = list(parse_inserts(DUMP, "users", cols))
    assert len(records) == 3
    assert records[0]["id"] == 1 and records[0]["name"] == "alice"
    assert records[1]["name"] == "bob, the 'builder'"
    assert "score" not in records[1]  # NULL dropped
    assert records[1]["active"] is False
    assert records[2]["name"] == "carol (x)"


def test_end_to_end_import(tmp_path):
    dump = tmp_path / "dump.sql"
    dump.write_text(DUMP)
    server = NativeTCPServer(TableService(), port=0).start()
    try:
        r = subprocess.run(
            [
                sys.executable,
                "-m",
                "eventql_tpu.cli.mysql2evql",
                "--source_file",
                str(dump),
                "--source_table",
                "users",
                "--host",
                "127.0.0.1",
                "--port",
                str(server.port),
            ],
            capture_output=True,
            text=True,
            timeout=120,
        )
        assert r.returncode == 0, r.stderr
        assert "imported 3 rows" in r.stdout
        c = NativeTCPClient("127.0.0.1", server.port)
        rows = c.query("select id, name from users order by id;")[0][1]
        assert rows == [
            ["1", "alice"],
            ["2", "bob, the 'builder'"],
            ["3", "carol (x)"],
        ]
        c.close()
    finally:
        server.stop()
