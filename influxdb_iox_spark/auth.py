"""User registry + privilege model for the v1 HTTP API.

The v0 reference ships unauthenticated (its HTTP router has no auth layer —
src/influxdb_ioxd/http.rs routes straight to handlers), so this surface
targets stock InfluxDB 1.x compatibility: CREATE USER / DROP USER / SET
PASSWORD / GRANT / REVOKE / SHOW USERS / SHOW GRANTS managed over
InfluxQL, credentials checked per request (u/p params, HTTP Basic, or the
1.8 ``Authorization: Token u:p`` form — http_api.check_http_auth).

Model (stock semantics, simplified where stock is meta-store specific):

- registry empty → anonymous access everywhere (the reference default).
- an ``admin`` user can do everything; the FIRST user created while the
  registry is empty must be an admin (stock bootstrap rule).
- non-admin privileges are per database: READ, WRITE, or ALL (both).
- privilege checks are per STATEMENT (v1_api.run_statements): user
  management and DDL need admin; DELETE and SELECT…INTO need WRITE on the
  selected database; SELECT/SHOW need READ.

The registry is in-memory and thread-safe (the HTTP server is threaded).
Durability is the deployment's concern — construct it from config at
startup; ``snapshot()``/``restore()`` give a JSON-able round-trip.
"""

from __future__ import annotations

import hashlib
import secrets as _secrets
import threading
from dataclasses import dataclass


class AuthError(Exception):
    """Privilege failure → HTTP 403 (stock 'user is not authorized')."""


# -- password hashing (at-rest secrets are salted scrypt, like stock 1.8's
#    bcrypt hashes; stdlib-only) ------------------------------------------

_SCRYPT_N, _SCRYPT_R, _SCRYPT_P = 16384, 8, 1


def hash_password(password: str) -> str:
    """Salted scrypt digest in a self-describing record:
    ``scrypt$N$r$p$salt_hex$hash_hex`` (parameters ride along so they can
    be raised later without invalidating stored credentials)."""
    salt = _secrets.token_bytes(16)
    h = hashlib.scrypt(
        password.encode("utf-8"),
        salt=salt,
        n=_SCRYPT_N,
        r=_SCRYPT_R,
        p=_SCRYPT_P,
    )
    return (
        f"scrypt${_SCRYPT_N}${_SCRYPT_R}${_SCRYPT_P}"
        f"${salt.hex()}${h.hex()}"
    )


class HashedSecret(str):
    """Marker type for a stored secret that IS a scrypt record.  Only
    ``UserRegistry.get`` produces these, so hash-record parsing can never
    swallow a plain config-dict password that happens to start with
    ``scrypt$`` (which would make that user permanently unable to log
    in — the sniff-the-prefix dispatch bug)."""

    __slots__ = ()


def _verify_scrypt(record: str, given: str) -> bool:
    try:
        _, n, r, p, salt_hex, hash_hex = record.split("$")
        h = hashlib.scrypt(
            given.encode("utf-8"),
            salt=bytes.fromhex(salt_hex),
            n=int(n),
            r=int(r),
            p=int(p),
        )
    except (ValueError, TypeError):
        return False
    return _secrets.compare_digest(h.hex(), hash_hex)


#: lazily-built record for timing-equalized unknown-user rejections
_DUMMY_RECORD: str | None = None


def _burn_scrypt(given: str) -> None:
    """One scrypt computation against a throwaway record, so rejecting an
    unknown username costs the same as rejecting a wrong password —
    otherwise the fast path is a username-enumeration timing oracle."""
    global _DUMMY_RECORD
    if _DUMMY_RECORD is None:
        _DUMMY_RECORD = hash_password("\x00never-a-password\x00")
    _verify_scrypt(_DUMMY_RECORD, given)


def verify_secret(stored: str | None, given: str) -> bool:
    """Constant-time check of ``given`` against a stored secret — a
    ``HashedSecret`` scrypt record (registry users; the TYPE carries the
    dispatch, never a string-prefix sniff) or a plaintext value (the
    plain config-dict auth surface, which never persists)."""
    if stored is None:
        return False
    if isinstance(stored, HashedSecret):
        return _verify_scrypt(stored, given)
    # bytes, not str: compare_digest(str, str) raises on non-ASCII, and
    # passwords are arbitrary text
    return _secrets.compare_digest(
        stored.encode("utf-8"), given.encode("utf-8")
    )


def verify_credentials(users, name: str | None, password: str) -> bool:
    """The one comparison the HTTP layer uses: works on a UserRegistry
    (hashed at rest) and on a plain ``{user: password}`` dict alike.
    Against a hashed-at-rest registry, an unknown username burns a dummy
    scrypt so its rejection is timing-indistinguishable from a wrong
    password."""
    if name is None:
        return False
    stored = users.get(name)
    if stored is None and getattr(users, "hashed_at_rest", False):
        _burn_scrypt(password)
        return False
    return verify_secret(stored, password)


@dataclass
class _User:
    #: scrypt record (never plaintext) — see hash_password
    password: str
    admin: bool


_PRIV_ORDER = {"read": {"read"}, "write": {"write"}, "all": {"read", "write"}}


class UserRegistry:
    """Thread-safe user/privilege store.

    Duck-types the secret-dict surface the HTTP auth check consumes
    (``get(name) -> stored secret | None``, truthiness = "auth enabled"),
    so ``check_http_auth`` works on either a plain dict or a registry.
    Registry secrets are salted scrypt records (hashed at rest, like
    stock 1.8's bcrypt) — comparison goes through ``verify_secret``,
    never ``==``, and ``get`` never returns plaintext.
    """

    #: secrets from .get() are scrypt records (HashedSecret), and unknown
    #: users must burn a dummy scrypt in verify_credentials
    hashed_at_rest = True

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._users: dict[str, _User] = {}
        #: (user, db) -> 'read' | 'write' | 'all'
        self._grants: dict[tuple[str, str], str] = {}

    # -- password-dict compatibility (check_http_auth) ----------------------
    def get(self, name: str):
        with self._lock:
            u = self._users.get(name)
            return HashedSecret(u.password) if u is not None else None

    def __bool__(self) -> bool:
        with self._lock:
            return bool(self._users)

    # -- construction --------------------------------------------------------
    @classmethod
    def from_passwords(
        cls, users: dict[str, str] | None, admin: bool = True
    ) -> "UserRegistry":
        """Back-compat adapter for the config-provided ``{user: password}``
        dict: those users are operator-provisioned, so they default to
        admin (the pre-registry behavior where any authenticated user
        could do everything)."""
        reg = cls()
        for name, pw in (users or {}).items():
            reg._users[name] = _User(hash_password(pw), admin)
        return reg

    # -- management (the InfluxQL statements) --------------------------------
    def create_user(self, name: str, password: str, admin: bool) -> None:
        with self._lock:
            if name in self._users:
                raise AuthError(f"user already exists: {name}")
            if not self._users and not admin:
                # stock bootstrap rule: the first user must be an admin,
                # otherwise the instance locks itself out of management
                raise AuthError(
                    "the first user must be created WITH ALL PRIVILEGES"
                )
            self._users[name] = _User(hash_password(password), admin)

    def drop_user(self, name: str) -> None:
        with self._lock:
            if name not in self._users:
                raise AuthError(f"user not found: {name}")
            del self._users[name]
            self._grants = {
                k: v for k, v in self._grants.items() if k[0] != name
            }

    def set_password(self, name: str, password: str) -> None:
        with self._lock:
            if name not in self._users:
                raise AuthError(f"user not found: {name}")
            self._users[name].password = hash_password(password)

    def grant(self, privilege: str, db: str | None, user: str) -> None:
        """GRANT READ|WRITE|ALL ON db TO user; GRANT ALL (no ON) makes the
        user a cluster admin (stock's 'GRANT ALL PRIVILEGES TO').

        Stock SET-semantics: a db grant REPLACES the user's previous
        privilege on that db (READ then WRITE leaves WRITE only — grant
        ALL for both), mirroring the 1.x meta-store's SetPrivilege."""
        if privilege not in ("read", "write", "all"):
            raise AuthError(f"invalid privilege {privilege!r}")
        with self._lock:
            if user not in self._users:
                raise AuthError(f"user not found: {user}")
            if db is None:
                if privilege != "all":
                    raise AuthError(
                        "only ALL PRIVILEGES can be granted cluster-wide"
                    )
                self._users[user].admin = True
                return
            self._grants[(user, db)] = privilege

    def revoke(self, privilege: str, db: str | None, user: str) -> None:
        if privilege not in ("read", "write", "all"):
            raise AuthError(f"invalid privilege {privilege!r}")
        with self._lock:
            if user not in self._users:
                raise AuthError(f"user not found: {user}")
            if db is None:
                if privilege != "all":
                    raise AuthError(
                        "only ALL PRIVILEGES can be revoked cluster-wide"
                    )
                self._users[user].admin = False
                return
            cur = self._grants.get((user, db))
            if cur is None:
                return
            if privilege == "all" or cur == privilege:
                del self._grants[(user, db)]
            elif cur == "all":
                # revoking one half of ALL leaves the other
                self._grants[(user, db)] = (
                    "write" if privilege == "read" else "read"
                )

    # -- introspection --------------------------------------------------------
    def list_users(self) -> list[tuple[str, bool]]:
        with self._lock:
            return sorted(
                (name, u.admin) for name, u in self._users.items()
            )

    def grants_for(self, user: str) -> list[tuple[str, str]]:
        with self._lock:
            if user not in self._users:
                raise AuthError(f"user not found: {user}")
            return sorted(
                (db, priv)
                for (u, db), priv in self._grants.items()
                if u == user
            )

    def is_admin(self, user: str | None) -> bool:
        with self._lock:
            u = self._users.get(user) if user is not None else None
            return u is not None and u.admin

    def can(self, user: str | None, db: str | None, need: str) -> bool:
        """need: 'read' | 'write'.  Admin → always; otherwise the (user,
        selected-db) grant must cover it.  No db selected → READ allowed
        for any authenticated user (db-less SHOW etc.), WRITE denied."""
        with self._lock:
            if not self._users:
                return True
            u = self._users.get(user) if user is not None else None
            if u is None:
                return False
            if u.admin:
                return True
            if db is None:
                return need == "read"
            priv = self._grants.get((user, db))
            return priv is not None and need in _PRIV_ORDER[priv]

    # -- durability seam ------------------------------------------------------
    def snapshot(self) -> dict:
        with self._lock:
            return {
                "users": {
                    n: {"password": u.password, "admin": u.admin}
                    for n, u in self._users.items()
                },
                "grants": [
                    [u, db, p] for (u, db), p in sorted(self._grants.items())
                ],
            }

    @classmethod
    def restore(cls, doc: dict) -> "UserRegistry":
        reg = cls()
        for n, rec in doc.get("users", {}).items():
            pw = rec["password"]
            if not pw.startswith("scrypt$"):
                # legacy plaintext snapshot (pre-round-11): upgrade at
                # restore so plaintext never persists again
                pw = hash_password(pw)
            reg._users[n] = _User(pw, bool(rec["admin"]))
        for u, db, p in doc.get("grants", []):
            reg._grants[(u, db)] = p
        return reg


def http_identity(
    users,
    auth_header: str | None,
    u: str | None = None,
    p: str | None = None,
) -> tuple[bool, str | None]:
    """Resolve the request's identity: (authorized?, username).

    Anonymous mode (no users configured) → (True, None).  Credential
    precedence matches check_http_auth: explicit u/p params, then HTTP
    Basic, then the 1.8 Token form."""
    if not users:
        return True, None
    if u is not None or p is not None:
        ok = verify_credentials(users, u, p or "")
        return ok, (u if ok else None)
    if auth_header:
        scheme, _, rest = auth_header.partition(" ")
        if scheme.lower() == "basic":
            import base64

            try:
                decoded = base64.b64decode(rest.strip()).decode("utf-8")
            except Exception:
                return False, None
            user, _, pw = decoded.partition(":")
            ok = verify_credentials(users, user, pw)
            return ok, (user if ok else None)
        if scheme.lower() == "token":
            user, _, pw = rest.strip().partition(":")
            ok = verify_credentials(users, user, pw)
            return ok, (user if ok else None)
    return False, None
