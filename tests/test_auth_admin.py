"""User management + privileges: the stock 1.x admin statements
(CREATE USER / DROP USER / SET PASSWORD / GRANT / REVOKE / SHOW USERS /
SHOW GRANTS) over auth.UserRegistry, and per-statement authorization in
the v1 envelope path.

The v0 reference is unauthenticated (src/influxdb_ioxd/http.rs has no
auth layer); this surface targets stock 1.x client compatibility."""

from __future__ import annotations

import base64
import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from influxdb_iox_spark.auth import verify_secret, AuthError, UserRegistry, http_identity
from influxdb_iox_spark.influxql.ast_nodes import (
    CreateUser,
    DropUser,
    GrantStatement,
    RevokeStatement,
    SetPassword,
    ShowStatement,
)
from influxdb_iox_spark.influxql.parser import InfluxQLParseError, parse
from influxdb_iox_spark.influxql.v1_api import run_statements


# -- registry (no Spark) ------------------------------------------------------


def test_registry_lifecycle():
    reg = UserRegistry()
    assert not reg  # anonymous mode
    reg.create_user("root", "pw", admin=True)
    assert reg and verify_secret(reg.get("root"), "pw") and reg.is_admin("root")
    assert reg.get("root").startswith("scrypt$")  # hashed at rest, never plaintext
    reg.create_user("bob", "b", admin=False)
    assert not reg.is_admin("bob")
    reg.set_password("bob", "b2")
    assert verify_secret(reg.get("bob"), "b2") and not verify_secret(
        reg.get("bob"), "b"
    )
    reg.drop_user("bob")
    assert reg.get("bob") is None
    with pytest.raises(AuthError):
        reg.drop_user("bob")
    with pytest.raises(AuthError):
        reg.create_user("root", "again", admin=True)


def test_plain_dict_password_looking_like_scrypt_still_authenticates():
    """Secret-kind dispatch is by TYPE (HashedSecret from the registry),
    never a string-prefix sniff: a config-dict user whose plaintext
    password legitimately begins with 'scrypt$' must be able to log in
    (prefix-sniffing parsed it as a hash record and locked them out)."""
    from influxdb_iox_spark.auth import verify_credentials

    users = {"eve": "scrypt$my$actual$password"}
    assert verify_credentials(users, "eve", "scrypt$my$actual$password")
    assert not verify_credentials(users, "eve", "wrong")


def test_unknown_user_burns_dummy_scrypt_against_registry(monkeypatch):
    """Username-enumeration timing oracle: rejecting an unknown user
    against a hashed-at-rest registry must cost one scrypt computation,
    exactly like rejecting a wrong password."""
    import influxdb_iox_spark.auth as A

    reg = UserRegistry()
    reg.create_user("root", "pw", admin=True)
    burned = []
    monkeypatch.setattr(A, "_burn_scrypt", lambda pw: burned.append(pw))
    assert not A.verify_credentials(reg, "who", "guess")
    assert burned == ["guess"]
    # plain dicts (plaintext compares, both paths fast) never burn
    assert not A.verify_credentials({"a": "b"}, "who", "guess")
    assert burned == ["guess"]


def test_registry_first_user_must_be_admin():
    reg = UserRegistry()
    with pytest.raises(AuthError):
        reg.create_user("bob", "b", admin=False)


def test_registry_grants_and_can():
    reg = UserRegistry()
    reg.create_user("root", "pw", admin=True)
    reg.create_user("bob", "b", admin=False)
    assert not reg.can("bob", "db1", "read")
    reg.grant("read", "db1", "bob")
    assert reg.can("bob", "db1", "read")
    assert not reg.can("bob", "db1", "write")
    reg.grant("all", "db1", "bob")
    assert reg.can("bob", "db1", "write")
    # revoking one half of ALL leaves the other
    reg.revoke("write", "db1", "bob")
    assert reg.can("bob", "db1", "read")
    assert not reg.can("bob", "db1", "write")
    assert reg.grants_for("bob") == [("db1", "read")]
    # cluster-wide ALL toggles admin
    reg.grant("all", None, "bob")
    assert reg.is_admin("bob") and reg.can("bob", "other", "write")
    reg.revoke("all", None, "bob")
    assert not reg.is_admin("bob")
    # unknown user / invalid privilege
    with pytest.raises(AuthError):
        reg.grant("read", "db1", "nobody")
    with pytest.raises(AuthError):
        reg.grant("read", None, "bob")
    # db-less read is open to any authenticated user, write is not
    assert reg.can("bob", None, "read")
    assert not reg.can("bob", None, "write")
    # unauthenticated identity against a configured registry
    assert not reg.can(None, "db1", "read")


def test_registry_snapshot_roundtrip():
    reg = UserRegistry()
    reg.create_user("root", "pw", admin=True)
    reg.create_user("bob", "b", admin=False)
    reg.grant("write", "db1", "bob")
    twin = UserRegistry.restore(reg.snapshot())
    assert twin.list_users() == reg.list_users()
    assert twin.grants_for("bob") == [("db1", "write")]
    assert verify_secret(twin.get("bob"), "b")
    # the snapshot itself carries no plaintext — every stored secret is a
    # scrypt record, and restoring a LEGACY plaintext snapshot upgrades it
    assert all(
        rec["password"].startswith("scrypt$")
        for rec in reg.snapshot()["users"].values()
    )
    legacy = UserRegistry.restore(
        {"users": {"old": {"password": "plain", "admin": True}}, "grants": []}
    )
    assert legacy.get("old").startswith("scrypt$")
    assert verify_secret(legacy.get("old"), "plain")


def test_http_identity():
    reg = UserRegistry()
    assert http_identity(reg, None) == (True, None)  # anonymous mode
    reg.create_user("alice", "s3cret", admin=True)
    assert http_identity(reg, None, "alice", "s3cret") == (True, "alice")
    assert http_identity(reg, None, "alice", "nope") == (False, None)
    basic = "Basic " + base64.b64encode(b"alice:s3cret").decode()
    assert http_identity(reg, basic) == (True, "alice")
    assert http_identity(reg, "Token alice:s3cret") == (True, "alice")
    assert http_identity(reg, "Token alice:bad") == (False, None)


# -- parser -------------------------------------------------------------------


def test_parse_user_statements():
    assert parse("CREATE USER bob WITH PASSWORD 'pw'") == CreateUser(
        "bob", "pw", False
    )
    assert parse(
        "CREATE USER root WITH PASSWORD 'p' WITH ALL PRIVILEGES"
    ) == CreateUser("root", "p", True)
    assert parse('DROP USER "bob"') == DropUser("bob")
    assert parse("SET PASSWORD FOR bob = 'new'") == SetPassword("bob", "new")
    assert parse("GRANT READ ON db1 TO bob") == GrantStatement(
        "read", "db1", "bob"
    )
    assert parse("GRANT ALL PRIVILEGES TO bob") == GrantStatement(
        "all", None, "bob"
    )
    assert parse("REVOKE WRITE ON db1 FROM bob") == RevokeStatement(
        "write", "db1", "bob"
    )
    s = parse("SHOW USERS")
    assert isinstance(s, ShowStatement) and s.what == "users"
    s = parse("SHOW GRANTS FOR bob")
    assert s.what == "grants" and s.for_user == "bob"
    with pytest.raises(InfluxQLParseError):
        parse("CREATE USER bob")  # missing WITH PASSWORD
    with pytest.raises(InfluxQLParseError):
        parse("GRANT EVERYTHING ON db1 TO bob")
    with pytest.raises(InfluxQLParseError):
        parse("SET PASSWORD FOR bob")  # missing = 'pw'


# -- run_statements integration (user statements touch no catalog) ------------


def _run(q, reg, identity=None, **kw):
    return run_statements(
        q, {}, registry=reg, identity=identity, selected_db="db0", **kw
    )


def test_envelope_user_management_bootstrap_and_show():
    reg = UserRegistry()
    env = _run(
        "CREATE USER root WITH PASSWORD 'pw' WITH ALL PRIVILEGES", reg
    )
    assert env["results"][0] == {"statement_id": 0}
    env = _run("SHOW USERS", reg, identity="root")
    assert env["results"][0]["series"] == [
        {"columns": ["user", "admin"], "values": [["root", True]]}
    ]
    _run("CREATE USER bob WITH PASSWORD 'b'", reg, identity="root")
    _run("GRANT READ ON db0 TO bob", reg, identity="root")
    env = _run("SHOW GRANTS FOR bob", reg, identity="root")
    assert env["results"][0]["series"] == [
        {"columns": ["database", "privilege"], "values": [["db0", "READ"]]}
    ]


def test_envelope_privilege_enforcement():
    reg = UserRegistry()
    reg.create_user("root", "pw", admin=True)
    reg.create_user("bob", "b", admin=False)
    # non-admin cannot manage users or run admin SHOWs
    env = _run("CREATE USER eve WITH PASSWORD 'e'", reg, identity="bob")
    assert "not authorized" in env["results"][0]["error"]
    env = _run("SHOW USERS", reg, identity="bob")
    assert "not authorized" in env["results"][0]["error"]
    # ...but may rotate their own password (stock behavior)
    env = _run("SET PASSWORD FOR bob = 'b2'", reg, identity="bob")
    assert "error" not in env["results"][0]
    assert verify_secret(reg.get("bob"), "b2") and not verify_secret(
        reg.get("bob"), "b"
    )
    env = _run("SET PASSWORD FOR root = 'hax'", reg, identity="bob")
    assert "not authorized" in env["results"][0]["error"]
    # SELECT gated on READ of the selected db — the auth error fires
    # BEFORE planning (no catalog here, so a pass-through would raise
    # 'unknown measurement' instead)
    env = _run("SELECT v FROM cpu", reg, identity="bob")
    assert "not authorized" in env["results"][0]["error"]
    reg.grant("read", "db0", "bob")
    env = _run("SELECT v FROM cpu", reg, identity="bob")
    assert "not authorized" not in env["results"][0]["error"]
    # DELETE needs WRITE
    env = _run("DELETE FROM cpu", reg, identity="bob")
    assert "not authorized" in env["results"][0]["error"]
    # user management without a registry configured → clear error
    env = run_statements("SHOW USERS", {}, registry=None)
    assert "user registry" in env["results"][0]["error"]


def test_envelope_read_only_rejects_user_ddl():
    reg = UserRegistry()
    env = _run(
        "CREATE USER root WITH PASSWORD 'pw' WITH ALL PRIVILEGES",
        reg,
        read_only=True,
    )
    assert "POST" in env["results"][0]["error"]
    assert not reg  # nothing created


# -- HTTP end-to-end ----------------------------------------------------------


@pytest.fixture()
def reg_server(spark, tmp_path):
    from influxdb_iox_spark.database import Database
    from influxdb_iox_spark.http_api import IoxHttpServer
    from influxdb_iox_spark.schema import InfluxColumnType, IoxSchema
    from influxdb_iox_spark.sources.store import TableStore
    from influxdb_iox_spark.streaming.ingest import LineProtocolIngest

    cpu = IoxSchema.build(["region"], {"user": InfluxColumnType.FIELD_FLOAT})
    store = TableStore(str(tmp_path / "reg_store"))
    db = Database("db0", store, spark)
    db.register_table("cpu", cpu)
    ing = LineProtocolIngest(store, "cpu", cpu)
    api = IoxHttpServer(
        db, {"cpu": ing}, db_name="db0", users=UserRegistry()
    )
    port = api.start()
    yield f"http://127.0.0.1:{port}", api
    api.stop()


def _post_query(base, q, **params):
    data = urllib.parse.urlencode({"q": q, **params}).encode()
    req = urllib.request.Request(f"{base}/query", data=data)
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def _status(base, path, body=None):
    try:
        req = urllib.request.Request(base + path, data=body)
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status
    except urllib.error.HTTPError as e:
        return e.code


def test_http_user_admin_flow(reg_server):
    base, api = reg_server
    # bootstrap: empty registry = anonymous; first CREATE USER must be admin
    env = _post_query(
        base, "CREATE USER root WITH PASSWORD 'pw' WITH ALL PRIVILEGES"
    )
    assert env["results"][0] == {"statement_id": 0}
    # now auth is on: anonymous requests 401
    assert _status(base, "/query?q=SHOW%20USERS") == 401
    # admin manages users over the API
    env = _post_query(
        base,
        "CREATE USER bob WITH PASSWORD 'b'; GRANT READ ON db0 TO bob",
        u="root", p="pw",
    )
    assert all("error" not in r for r in env["results"])
    # bob can read…
    env = _post_query(base, "SHOW MEASUREMENTS", u="bob", p="b")
    assert "error" not in env["results"][0]
    # …cannot write line protocol (403), until granted
    lines = b"cpu,region=west user=1.0 100"
    assert _status(base, "/write?db=db0&u=bob&p=b", body=lines) == 403
    _post_query(base, "GRANT WRITE ON db0 TO bob", u="root", p="pw")
    assert _status(base, "/write?db=db0&u=bob&p=b", body=lines) == 204
    # …and cannot run DDL
    env = _post_query(base, "DROP MEASUREMENT cpu", u="bob", p="b")
    assert "not authorized" in env["results"][0]["error"]
    # SHOW GRANTS: stock set-semantics — the WRITE grant REPLACED the READ
    env = _post_query(base, "SHOW GRANTS FOR bob", u="root", p="pw")
    vals = env["results"][0]["series"][0]["values"]
    assert vals == [["db0", "WRITE"]]
    # (so bob lost read access — grant ALL to get both)
    env = _post_query(base, "SHOW MEASUREMENTS", u="bob", p="b")
    assert "not authorized" in env["results"][0]["error"]
