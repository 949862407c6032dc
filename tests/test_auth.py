"""Client auth tests (reference: auth/client_auth_legacy.cc token
verification; util/web/SecureCookie.cc cookie format — base64 payload,
created-at micros, PLAIN, HMAC-SHA1 over the prefix)."""

import pytest

from eventql_tpu.core.errors import SQLError
from eventql_tpu.db.table_service import TableService
from eventql_tpu.server.auth import (
    AuthError,
    LegacyClientAuth,
    SecureCookieCoder,
    TrustClientAuth,
    decode_token_data,
    encode_token_data,
)
from eventql_tpu.server.native_tcp import NativeTCPClient, NativeTCPServer


def test_secure_cookie_roundtrip():
    coder = SecureCookieCoder("s3cret")
    token = coder.encode(b"hello world")
    assert coder.decode_and_verify(token) == b"hello world"
    # tamper → rejected
    bad = token[:-1] + ("0" if token[-1] != "0" else "1")
    assert coder.decode_and_verify(bad) is None
    # wrong key → rejected
    assert SecureCookieCoder("other").decode_and_verify(token) is None


def test_secure_cookie_expiry():
    coder = SecureCookieCoder("k", expire_after_days=1)
    old = coder.encode(b"x", created_us=1)  # 1970
    assert coder.decode_and_verify(old) is None


def test_token_data_protobuf():
    blob = encode_token_data("mydb", "alice")
    assert decode_token_data(blob) == ("mydb", "alice")


def test_legacy_auth_sessions():
    auth = LegacyClientAuth("topsecret")
    token = auth.make_token("proddb", "bob")
    sess = auth.authenticate({"auth_token": token})
    assert sess.effective_namespace == "proddb"
    assert sess.user_id == "bob"
    with pytest.raises(AuthError, match="missing auth token"):
        auth.authenticate({})
    with pytest.raises(AuthError, match="invalid auth token"):
        auth.authenticate({"auth_token": "garbage|1|PLAIN||00"})


def test_native_server_rejects_bad_token():
    auth = LegacyClientAuth("topsecret")
    server = NativeTCPServer(TableService(), port=0, client_auth=auth).start()
    try:
        # valid token → handshake succeeds
        token = auth.make_token("db", "u")
        c = NativeTCPClient("127.0.0.1", server.port, auth_token=token)
        assert c.query("select 1 as x;") == [(["x"], [["1"]])]
        c.close()
        # no token → ERROR during handshake
        with pytest.raises(SQLError, match="missing auth token"):
            NativeTCPClient("127.0.0.1", server.port)
        # forged token → ERROR
        with pytest.raises(SQLError, match="invalid auth token"):
            NativeTCPClient(
                "127.0.0.1", server.port, auth_token="a|1|PLAIN||beef"
            )
    finally:
        server.stop()


def test_trust_auth_default():
    server = NativeTCPServer(TableService(), port=0).start()
    try:
        c = NativeTCPClient("127.0.0.1", server.port, user="any")
        assert c.ping()
        c.close()
    finally:
        server.stop()


def test_http_auth_token():
    import json as _json
    import urllib.request

    from eventql_tpu.server.http_api import EventQLServer

    auth = LegacyClientAuth("websecret")
    server = EventQLServer(port=0, client_auth=auth).start()
    try:
        url = f"http://127.0.0.1:{server.port}/api/v1/sql"
        body = _json.dumps({"query": "select 2 + 2 as four;"}).encode()

        # no token → 401
        req = urllib.request.Request(url, data=body)
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 401

        # valid token → 200
        token = auth.make_token("db", "u")
        req = urllib.request.Request(
            url, data=body, headers={"Authorization": f"Token {token}"}
        )
        resp = _json.loads(urllib.request.urlopen(req, timeout=10).read())
        assert resp["results"][0]["rows"] == [["4"]]
    finally:
        server.stop()
