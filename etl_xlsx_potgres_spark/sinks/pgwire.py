"""Minimal pure-Python PostgreSQL driver (DB-API v2 subset) over the
documented frontend/backend wire protocol v3.

WHY THIS EXISTS. The reference's load phase is psycopg2 row-at-a-time
(``/root/reference/etl_process.py:23-26,40,75``); our executor-side
sink (``jdbc.foreach_partition_upsert``) preserves its statement-level
``ON CONFLICT`` semantics at partition parallelism but needs a DB-API
driver on the workers. This runtime ships neither psycopg2 nor a
Postgres JDBC jar, so the live path was environment-blocked for four
rounds. The server binaries ARE present — this module removes the
last block with ~200 lines of protocol code, no third-party
dependency, so the sink can be exercised against a real Postgres
(sequences, unique-constraint arbitration, FK enforcement) instead of
a recording fake.

Scope (deliberately small):

- simple Query protocol only (text results), startup with ``trust``,
  ``cleartext`` or ``md5`` auth (SCRAM raises with a clear message —
  use a real driver there);
- the DB-API surface the sink uses: ``connect(dsn)``,
  ``Connection.cursor/commit/rollback/close``, ``Cursor.execute/
  executemany/fetchall/description``, cursor as context manager;
- psycopg2-style CLIENT-side parameter interpolation: ``%s``
  placeholders are replaced with safely quoted literals before the
  statement is sent (exactly psycopg2's model — it also formats
  client-side), so ``build_upsert_sql``/``build_insert_sql``
  statements run unchanged;
- ``executemany`` sends each batch as ONE multi-statement Query
  message (single round trip per batch) inside the connection's
  explicit transaction — the batched equivalent of the reference's
  per-row ``cur.execute`` loop.

Protocol layout (PostgreSQL docs, "Frontend/Backend Protocol",
"Message Formats"): every backend message is a 1-byte type, an int32
length (includes itself), and the payload; the startup packet has no
type byte. Wire details below cite the message names from that
chapter.

At scale this driver is for the executor hot path: one connection and
one multi-statement round trip per ``batch_rows`` slice per
partition; no driver-side fan-in.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import hashlib
import socket
import struct
from urllib.parse import urlparse

apilevel = "2.0"
threadsafety = 1
paramstyle = "format"  # %s, interpolated client-side like psycopg2


class DatabaseError(Exception):
    """ErrorResponse from the server (severity, SQLSTATE, message)."""


class InterfaceError(Exception):
    """Protocol/usage error on the client side."""


def _literal(v) -> str:
    """One value -> SQL literal. Quote-doubling only: the server
    default ``standard_conforming_strings=on`` makes backslashes
    literal, so doubling single quotes is the complete escape."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float, _decimal.Decimal)):
        return str(v)
    if isinstance(v, (_dt.datetime, _dt.date, _dt.time)):
        return "'" + v.isoformat() + "'"
    if isinstance(v, (bytes, bytearray)):
        return "'\\x" + bytes(v).hex() + "'"
    return "'" + str(v).replace("'", "''") + "'"


def _interpolate(sql: str, params) -> str:
    """psycopg2-style %s substitution (``%%`` escapes a literal %)."""
    return sql % tuple(_literal(p) for p in params)


class Cursor:
    def __init__(self, conn: "Connection"):
        self._conn = conn
        self.description = None
        self._rows: list[tuple] = []

    def execute(self, sql: str, params=None) -> None:
        if params is not None:
            sql = _interpolate(sql, params)
        self._conn._begin_if_needed()
        self.description, self._rows = self._conn._query(sql)

    def executemany(self, sql: str, seq_of_params) -> None:
        stmts = [_interpolate(sql, p) for p in seq_of_params]
        if not stmts:
            return
        self._conn._begin_if_needed()
        # one round trip per batch: a single multi-statement Query
        self.description, self._rows = self._conn._query("; ".join(stmts))

    def fetchall(self) -> list[tuple]:
        return list(self._rows)

    def fetchone(self):
        return self._rows[0] if self._rows else None

    def close(self) -> None:
        self._rows = []

    def __enter__(self) -> "Cursor":
        return self

    def __exit__(self, *exc) -> bool:
        self.close()
        return False


class Connection:
    def __init__(self, host: str, port: int, user: str, database: str,
                 password: str | None = None, timeout: float = 30.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._buf = b""
        self._in_tx = False
        self._startup(user, database, password)

    # -- wire primitives -------------------------------------------------
    def _send(self, type_byte: bytes, payload: bytes) -> None:
        self._sock.sendall(type_byte + struct.pack("!I", len(payload) + 4) + payload)

    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise InterfaceError("server closed the connection")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _recv_message(self) -> tuple[bytes, bytes]:
        head = self._recv_exact(5)
        type_byte = head[:1]
        (length,) = struct.unpack("!I", head[1:5])
        return type_byte, self._recv_exact(length - 4)

    @staticmethod
    def _parse_error(payload: bytes) -> str:
        fields = {}
        for part in payload.split(b"\x00"):
            if part:
                fields[chr(part[0])] = part[1:].decode("utf-8", "replace")
        return "{} {}: {}".format(
            fields.get("S", "ERROR"), fields.get("C", ""), fields.get("M", "")
        )

    # -- session ---------------------------------------------------------
    def _startup(self, user: str, database: str, password: str | None) -> None:
        params = {"user": user, "database": database, "client_encoding": "UTF8"}
        body = b"\x00\x03\x00\x00" + b"".join(
            k.encode() + b"\x00" + v.encode() + b"\x00" for k, v in params.items()
        ) + b"\x00"
        self._sock.sendall(struct.pack("!I", len(body) + 4) + body)
        while True:
            t, payload = self._recv_message()
            if t == b"R":  # Authentication*
                (code,) = struct.unpack("!I", payload[:4])
                if code == 0:  # AuthenticationOk (trust or accepted)
                    continue
                if code == 3:  # cleartext
                    if password is None:
                        raise InterfaceError("server wants a password")
                    self._send(b"p", password.encode() + b"\x00")
                    continue
                if code == 5:  # md5: md5(md5(password+user)+salt)
                    if password is None:
                        raise InterfaceError("server wants a password")
                    salt = payload[4:8]
                    inner = hashlib.md5(
                        password.encode() + user.encode()
                    ).hexdigest()
                    outer = hashlib.md5(inner.encode() + salt).hexdigest()
                    self._send(b"p", b"md5" + outer.encode() + b"\x00")
                    continue
                raise InterfaceError(
                    f"unsupported auth method {code} (SCRAM needs a full driver)"
                )
            if t in (b"S", b"K", b"N"):  # ParameterStatus/BackendKeyData/Notice
                continue
            if t == b"Z":  # ReadyForQuery
                return
            if t == b"E":
                raise DatabaseError(self._parse_error(payload))
            raise InterfaceError(f"unexpected startup message {t!r}")

    def _query(self, sql: str):
        """Simple Query ('Q'); drain to ReadyForQuery; raise the first
        ErrorResponse AFTER draining so the connection stays usable."""
        self._send(b"Q", sql.encode() + b"\x00")
        description = None
        rows: list[tuple] = []
        error: str | None = None
        while True:
            t, payload = self._recv_message()
            if t == b"T":  # RowDescription: int16 n, then per-column meta
                (n,) = struct.unpack("!H", payload[:2])
                off, cols = 2, []
                for _ in range(n):
                    end = payload.index(b"\x00", off)
                    cols.append((payload[off:end].decode(),) + (None,) * 6)
                    off = end + 1 + 18  # name NUL + 6 fixed int fields
                description = cols
            elif t == b"D":  # DataRow: int16 n, then (int32 len, bytes)*
                (n,) = struct.unpack("!H", payload[:2])
                off, vals = 2, []
                for _ in range(n):
                    (ln,) = struct.unpack("!i", payload[off:off + 4])
                    off += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        vals.append(payload[off:off + ln].decode())
                        off += ln
                rows.append(tuple(vals))
            elif t in (b"C", b"I", b"S", b"N", b"A"):
                continue  # CommandComplete/Empty/ParameterStatus/Notice/Notify
            elif t == b"E":
                error = error or self._parse_error(payload)
            elif t == b"Z":
                break
            else:
                raise InterfaceError(f"unexpected message {t!r}")
        if error:
            raise DatabaseError(error)
        return description, rows

    def _begin_if_needed(self) -> None:
        if not self._in_tx:
            self._query("BEGIN")
            self._in_tx = True

    # -- DB-API ----------------------------------------------------------
    def cursor(self) -> Cursor:
        return Cursor(self)

    def commit(self) -> None:
        if self._in_tx:
            self._query("COMMIT")
            self._in_tx = False

    def rollback(self) -> None:
        if self._in_tx:
            self._query("ROLLBACK")
            self._in_tx = False

    def close(self) -> None:
        try:
            self._sock.sendall(b"X" + struct.pack("!I", 4))  # Terminate
        except OSError:
            pass
        self._sock.close()


def connect(dsn: str, timeout: float = 30.0) -> Connection:
    """``postgresql://[user[:password]@]host[:port]/database`` — the
    DSN form ``JdbcTarget.dbapi_dsn()`` produces (psycopg2 accepts the
    same URL)."""
    u = urlparse(dsn)
    if u.scheme not in ("postgresql", "postgres"):
        raise InterfaceError(f"unsupported DSN scheme {u.scheme!r}")
    return Connection(
        host=u.hostname or "localhost",
        port=u.port or 5432,
        user=u.username or "postgres",
        database=(u.path or "/postgres").lstrip("/") or "postgres",
        password=u.password,
        timeout=timeout,
    )
