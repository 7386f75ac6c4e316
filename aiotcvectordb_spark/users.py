"""User / privilege management — op 18 of the reference surface.

Semantics (reference: aiotcvectordb/client/stub.py:923-1072 —
``create_user``, ``drop_user``, ``describe_user``, ``user_list``,
``change_password``, ``grant_to_user``, ``revoke_from_user`` over
``POST /user/*``): accounts with a password and a set of privileges,
each privilege = {resource: "db.*", actions: ["read", ...]}.

In an embedded engine this is a thin ACL table kept in the catalog
directory (SURVEY §2.1 op 18) — metadata-scale, never data-scale, so a
versioned JSON state file (metastore.JsonState, Hadoop FS) is the right store. Passwords are stored
as salted SHA-256 digests (an embedded engine must never keep
plaintext); verification is constant-time compare.
"""

from __future__ import annotations

import hashlib
import hmac
import secrets
import time
from typing import Any

from aiotcvectordb_spark.errors import ParamError


def _digest(password: str, salt: str) -> str:
    return hashlib.sha256((salt + password).encode()).hexdigest()


class UserManager:
    def __init__(self, root: str, spark=None) -> None:
        # versioned JSON state over the Hadoop FS API (r8): same code
        # path on local disk, HDFS, and object stores — no os.replace
        from aiotcvectordb_spark.metastore import JsonState

        self._state = JsonState(root, "users", {"users": {}}, spark)

    @property
    def path(self) -> str:
        return self._state.path

    def _load(self) -> dict:
        return self._state.load()

    def _save(self, data: dict) -> None:
        self._state.save(data)

    # -- lifecycle (reference stub.py:923-995) -------------------------------

    def create_user(self, user: str, password: str) -> None:
        data = self._load()
        if user in data["users"]:
            raise ParamError(f"user {user!r} already exists")
        salt = secrets.token_hex(8)
        data["users"][user] = {
            "salt": salt,
            "digest": _digest(password, salt),
            "create_time": time.strftime("%Y-%m-%d %H:%M:%S"),
            "privileges": [],
        }
        self._save(data)

    def drop_user(self, user: str) -> None:
        data = self._load()
        if user not in data["users"]:
            raise ParamError(f"user {user!r} does not exist")
        del data["users"][user]
        self._save(data)

    def describe_user(self, user: str) -> dict[str, Any]:
        data = self._load()
        if user not in data["users"]:
            raise ParamError(f"user {user!r} does not exist")
        u = data["users"][user]
        return {
            "user": user,
            "createTime": u["create_time"],
            "privileges": list(u["privileges"]),
        }

    def user_list(self) -> list[dict[str, Any]]:
        return [self.describe_user(u) for u in sorted(self._load()["users"])]

    def change_password(self, user: str, password: str) -> None:
        data = self._load()
        if user not in data["users"]:
            raise ParamError(f"user {user!r} does not exist")
        salt = secrets.token_hex(8)
        data["users"][user]["salt"] = salt
        data["users"][user]["digest"] = _digest(password, salt)
        self._save(data)

    def verify(self, user: str, password: str) -> bool:
        data = self._load()
        u = data["users"].get(user)
        if u is None:
            return False
        return hmac.compare_digest(u["digest"], _digest(password, u["salt"]))

    # -- privileges (reference stub.py:997-1072: privilege objects are
    # {resource, actions}; grant/revoke are set-union/-difference) ----------

    def grant_to_user(self, user: str, privileges: list[dict]) -> None:
        data = self._load()
        if user not in data["users"]:
            raise ParamError(f"user {user!r} does not exist")
        have = {
            (p["resource"], a)
            for p in data["users"][user]["privileges"]
            for a in p["actions"]
        }
        for p in privileges:
            for a in p.get("actions", []):
                have.add((p["resource"], a))
        data["users"][user]["privileges"] = _pack(have)
        self._save(data)

    def revoke_from_user(self, user: str, privileges: list[dict]) -> None:
        data = self._load()
        if user not in data["users"]:
            raise ParamError(f"user {user!r} does not exist")
        have = {
            (p["resource"], a)
            for p in data["users"][user]["privileges"]
            for a in p["actions"]
        }
        for p in privileges:
            for a in p.get("actions", []):
                have.discard((p["resource"], a))
        data["users"][user]["privileges"] = _pack(have)
        self._save(data)

    def has_privilege(self, user: str, resource: str, action: str) -> bool:
        """resource match honors the reference's "db.*" wildcard form."""
        data = self._load()
        u = data["users"].get(user)
        if u is None:
            return False
        for p in u["privileges"]:
            if action not in p["actions"]:
                continue
            res = p["resource"]
            if res == resource or res == "*":
                return True
            if res.endswith(".*") and (
                resource == res[:-2] or resource.startswith(res[:-1])
            ):
                return True
        return False


def _pack(pairs: set[tuple[str, str]]) -> list[dict]:
    by_res: dict[str, list[str]] = {}
    for res, act in sorted(pairs):
        by_res.setdefault(res, []).append(act)
    return [{"resource": r, "actions": acts} for r, acts in sorted(by_res.items())]
