"""User/privilege ops (op 18): lifecycle, password auth, grant/revoke
with db.* wildcard matching — reference stub.py:923-1072 semantics."""

from __future__ import annotations

import pytest

from aiotcvectordb_spark.engine import VectorDBEngine
from aiotcvectordb_spark.errors import ParamError


@pytest.fixture()
def engine(spark, tmp_path):
    return VectorDBEngine(spark, str(tmp_path / "store"))


def test_user_lifecycle(engine):
    engine.create_user("alice", "pw1")
    with pytest.raises(ParamError):
        engine.create_user("alice", "other")
    info = engine.describe_user("alice")
    assert info["user"] == "alice"
    assert info["privileges"] == []
    assert "pw1" not in open(engine.users.path).read()  # no plaintext at rest

    engine.create_user("bob", "pw2")
    assert [u["user"] for u in engine.user_list()] == ["alice", "bob"]

    engine.drop_user("bob")
    assert [u["user"] for u in engine.user_list()] == ["alice"]
    with pytest.raises(ParamError):
        engine.drop_user("bob")


def test_password_change_and_verify(engine):
    engine.create_user("alice", "pw1")
    assert engine.users.verify("alice", "pw1")
    assert not engine.users.verify("alice", "wrong")
    engine.change_password("alice", "pw2")
    assert not engine.users.verify("alice", "pw1")
    assert engine.users.verify("alice", "pw2")
    assert not engine.users.verify("ghost", "pw")


def test_grant_revoke_wildcard(engine):
    engine.create_user("alice", "pw")
    engine.grant_to_user(
        "alice", [{"resource": "db0.*", "actions": ["read", "readWrite"]}]
    )
    engine.grant_to_user("alice", [{"resource": "db1.coll1", "actions": ["read"]}])

    assert engine.users.has_privilege("alice", "db0.coll9", "read")
    assert engine.users.has_privilege("alice", "db0", "readWrite")
    assert engine.users.has_privilege("alice", "db1.coll1", "read")
    assert not engine.users.has_privilege("alice", "db1.coll2", "read")
    assert not engine.users.has_privilege("alice", "db1.coll1", "readWrite")

    engine.revoke_from_user("alice", [{"resource": "db0.*", "actions": ["readWrite"]}])
    assert engine.users.has_privilege("alice", "db0.coll9", "read")
    assert not engine.users.has_privilege("alice", "db0.coll9", "readWrite")

    privs = engine.describe_user("alice")["privileges"]
    assert {p["resource"] for p in privs} == {"db0.*", "db1.coll1"}


def test_reference_exception_surface_importable():
    """Every exception class the reference client exports must exist
    here with the (message, code) shape, so user `except` clauses port
    unchanged (reference aiotcvectordb/exceptions.py:20-46)."""
    from aiotcvectordb_spark import errors as E

    for name in (
        "VectorDBException", "ParamError", "NoConnectError", "ConnectError",
        "ServerInternalError", "DescribeCollectionException", "GrpcException",
    ):
        cls = getattr(E, name)
        exc = cls("boom")
        assert isinstance(exc, E.VectorDBError)
        assert exc.message == "boom" and isinstance(exc.code, int)
