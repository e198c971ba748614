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
  ``cleartext``, ``md5``, or ``scram-sha-256`` auth (RFC 5802/7677
  client over stdlib ``hashlib``/``hmac`` — PG 14+ default);
- the DB-API surface the sink uses: ``connect(dsn)``,
  ``Connection.cursor/commit/rollback/close``, ``Cursor.execute/
  executemany/fetchall/description``, cursor as context manager;
- psycopg2-style CLIENT-side parameter interpolation: ``%s``
  placeholders are replaced with safely quoted literals before the
  statement is sent (exactly psycopg2's model — it also formats
  client-side), so ``build_upsert_sql``/``build_insert_sql``
  statements run unchanged. Substitution is regex-token based
  (``%s`` and ``%%`` only); any other literal ``%`` in the statement
  (``LIKE '%x%'``, a ``%`` inside a quoted identifier) passes through
  verbatim — strictly more forgiving than Python ``%``-formatting;
- ``executemany`` sends each batch as ONE multi-statement Query
  message (single round trip per batch) inside the connection's
  explicit transaction — the batched equivalent of the reference's
  per-row ``cur.execute`` loop;
- ``Cursor.copy_rows``: ``COPY ... FROM STDIN`` text-format bulk load
  (CopyInResponse/CopyData/CopyDone) — the canonical Postgres bulk
  path, 10-50x over statement INSERTs for conflict-free appends.

Startup asserts ``standard_conforming_strings=on`` from the server's
ParameterStatus messages — the quote-doubling escape in ``_literal``
is only complete under that (default-on since PG 9.1) setting.

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

import base64
import datetime as _dt
import decimal as _decimal
import hashlib
import hmac
import math
import os
import re
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
    setting ``standard_conforming_strings=on`` (asserted at startup)
    makes backslashes literal, so doubling single quotes is the
    complete escape."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # bare nan/inf from str() is invalid SQL; psycopg2 emits the
        # quoted spellings, which float8 input accepts
        if not math.isfinite(v):
            if math.isnan(v):
                return "'NaN'::float8"
            return ("'Infinity'" if v > 0 else "'-Infinity'") + "::float8"
        return repr(v)  # repr() is shortest-roundtrip, str() == repr() on py3
    if isinstance(v, _decimal.Decimal):
        if not v.is_finite():
            if v.is_nan():
                return "'NaN'::numeric"
            return ("'Infinity'" if v > 0 else "'-Infinity'") + "::numeric"
        return str(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (_dt.datetime, _dt.date, _dt.time)):
        return "'" + v.isoformat() + "'"
    if isinstance(v, (bytes, bytearray)):
        return "'\\x" + bytes(v).hex() + "'"
    return "'" + str(v).replace("'", "''") + "'"


_PLACEHOLDER = re.compile(r"%[s%]")


def _interpolate(sql: str, params) -> str:
    """psycopg2-style ``%s`` substitution (``%%`` escapes a literal
    ``%``). Token-scan, not Python ``%``-formatting: only the exact
    two-char tokens ``%s``/``%%`` are rewritten, so a literal ``%``
    anywhere else (``LIKE '%x%'``, ``%`` inside a quoted identifier)
    passes through unchanged instead of raising ValueError."""
    lits = [_literal(p) for p in params]
    idx = 0

    def sub(m: re.Match) -> str:
        nonlocal idx
        if m.group(0) == "%%":
            return "%"
        if idx >= len(lits):
            raise InterfaceError(
                f"statement has more %s placeholders than the "
                f"{len(lits)} parameters supplied"
            )
        out = lits[idx]
        idx += 1
        return out

    rendered = _PLACEHOLDER.sub(sub, sql)
    if idx != len(lits):
        raise InterfaceError(
            f"{len(lits)} parameters supplied for {idx} %s placeholders"
        )
    return rendered


class _ScramClient:
    """SCRAM-SHA-256 client (RFC 5802 framing, RFC 7677 hash) over
    stdlib ``hashlib``/``hmac`` — the PostgreSQL 14+ default auth.

    GS2 header is ``n,,`` (no channel binding): this driver speaks
    plain TCP, so SCRAM-SHA-256-PLUS is never selected even when
    offered. Username in client-first is empty — PostgreSQL takes the
    user from the startup packet and ignores ``n=``. Password is used
    UTF-8 verbatim (SASLprep is a no-op for the ASCII passwords this
    sink's DSNs carry; full stringprep is out of scope and documented
    so)."""

    MECH = "SCRAM-SHA-256"

    def __init__(self, password: str, offered: list[str]):
        if self.MECH not in offered:
            raise InterfaceError(
                f"server offers SASL mechanisms {offered}; only "
                f"{self.MECH} is supported"
            )
        self.mechanism = self.MECH
        self._password = password.encode()
        self._nonce = base64.b64encode(os.urandom(18)).decode()
        self._client_first_bare = "n=,r=" + self._nonce
        self._auth_message: bytes | None = None
        self._salted: bytes | None = None

    def client_first(self) -> str:
        return "n,," + self._client_first_bare

    def client_final(self, server_first: str) -> str:
        fields = dict(f.split("=", 1) for f in server_first.split(","))
        nonce, salt_b64, iters = fields["r"], fields["s"], int(fields["i"])
        if not nonce.startswith(self._nonce):
            raise InterfaceError("SCRAM server nonce does not extend ours")
        self._salted = hashlib.pbkdf2_hmac(
            "sha256", self._password, base64.b64decode(salt_b64), iters
        )
        client_key = hmac.digest(self._salted, b"Client Key", "sha256")
        stored_key = hashlib.sha256(client_key).digest()
        # c=biws is base64("n,,") — the GS2 header echoed per RFC 5802
        without_proof = "c=biws,r=" + nonce
        self._auth_message = ",".join(
            [self._client_first_bare, server_first, without_proof]
        ).encode()
        sig = hmac.digest(stored_key, self._auth_message, "sha256")
        proof = bytes(a ^ b for a, b in zip(client_key, sig))
        return without_proof + ",p=" + base64.b64encode(proof).decode()

    def verify_server_final(self, server_final: str) -> None:
        if self._salted is None or self._auth_message is None:
            raise InterfaceError(
                "out-of-order SASL message: server-final received "
                "before client-final was computed"
            )
        fields = dict(f.split("=", 1) for f in server_final.split(","))
        if "e" in fields:
            raise DatabaseError(f"SCRAM server error: {fields['e']}")
        server_key = hmac.digest(self._salted, b"Server Key", "sha256")
        expect = hmac.digest(server_key, self._auth_message, "sha256")
        if not hmac.compare_digest(base64.b64decode(fields["v"]), expect):
            raise InterfaceError(
                "SCRAM server signature mismatch (server does not know "
                "the password — possible MITM)"
            )


def _copy_field(v) -> str:
    """One value -> COPY text-format field (PostgreSQL docs, "COPY",
    text format): NULL is ``\\N``; backslash, tab, newline and
    carriage return are backslash-escaped; float8/numeric accept the
    quoted-literal spellings NaN/Infinity as plain text here."""
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if not math.isfinite(v):
            return "NaN" if math.isnan(v) else ("Infinity" if v > 0 else "-Infinity")
        return repr(v)
    if isinstance(v, (int, _decimal.Decimal)):
        return str(v)
    if isinstance(v, (_dt.datetime, _dt.date, _dt.time)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "\\\\x" + bytes(v).hex()  # bytea hex; the \ itself escaped
    return (
        str(v)
        .replace("\\", "\\\\")
        .replace("\t", "\\t")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
    )


def _copy_encode(rows, flush_bytes: int = 256 * 1024):
    """Typed rows -> COPY text-format CopyData payload chunks
    (~``flush_bytes`` each, so one CopyData message per chunk instead
    of per row)."""
    buf: list[str] = []
    size = 0
    for row in rows:
        line = "\t".join(_copy_field(v) for v in row) + "\n"
        buf.append(line)
        size += len(line)
        if size >= flush_bytes:
            yield "".join(buf).encode()
            buf, size = [], 0
    if buf:
        yield "".join(buf).encode()


# Public API: sinks/jdbc.py's psycopg2/psycopg3 copy_expert fallback
# encodes rows with this module's COPY text format, so the encoder
# pair is part of the declared surface (not private helpers a
# refactor may silently break).
copy_field = _copy_field
copy_encode = _copy_encode


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

    def copy_rows(self, table: str, columns: list[str], rows) -> int:
        """``COPY table (columns) FROM STDIN`` over the wire protocol's
        CopyInResponse/CopyData/CopyDone messages — the canonical bulk
        path (one statement parse for the WHOLE load, data streamed as
        length-prefixed frames, no per-row SQL rendering). ``rows`` is
        any iterable of tuples in ``columns`` order; returns the
        server-reported row count. ``table``/``columns`` must already
        be safely quoted by the caller (``sinks.jdbc.quote_ident``) —
        this layer does data, not identifiers."""
        self.description = None  # COPY returns no result set: clear any
        self._rows = []          # stale rows from a prior execute()
        collist = ", ".join(columns)
        sql = f"COPY {table} ({collist}) FROM STDIN"
        self._conn._begin_if_needed()
        return self._conn._copy_in(sql, _copy_encode(rows))

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
        self._scram: _ScramClient | None = None
        self.parameters: dict[str, str] = {}  # ParameterStatus values
        self._startup(user, database, password)
        # the quote-doubling escape in _literal is only complete under
        # standard_conforming_strings=on (the default since PG 9.1);
        # refuse to run against a cluster that turned it off rather
        # than silently mis-escape backslashes
        scs = self.parameters.get("standard_conforming_strings", "on")
        if scs != "on":
            self.close()
            raise InterfaceError(
                "server reports standard_conforming_strings="
                f"{scs!r}; this driver requires 'on'"
            )

    def _param_status(self, payload: bytes) -> None:
        name, _, rest = payload.partition(b"\x00")
        value = rest.split(b"\x00", 1)[0]
        self.parameters[name.decode()] = value.decode()

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
                if code == 10:  # AuthenticationSASL: mechanism list
                    if password is None:
                        raise InterfaceError("server wants a password")
                    mechs = [
                        m.decode()
                        for m in payload[4:].split(b"\x00")
                        if m
                    ]
                    self._scram = _ScramClient(password, mechs)
                    first = self._scram.client_first().encode()
                    self._send(
                        b"p",
                        self._scram.mechanism.encode() + b"\x00"
                        + struct.pack("!I", len(first)) + first,
                    )
                    continue
                if code == 11:  # AuthenticationSASLContinue
                    if self._scram is None:
                        raise InterfaceError(
                            "out-of-order SASL message: SASLContinue "
                            "before AuthenticationSASL"
                        )
                    final = self._scram.client_final(payload[4:].decode())
                    self._send(b"p", final.encode())
                    continue
                if code == 12:  # AuthenticationSASLFinal: verify server sig
                    if self._scram is None:
                        raise InterfaceError(
                            "out-of-order SASL message: SASLFinal "
                            "before AuthenticationSASL"
                        )
                    self._scram.verify_server_final(payload[4:].decode())
                    continue
                raise InterfaceError(f"unsupported auth method {code}")
            if t == b"S":  # ParameterStatus
                self._param_status(payload)
                continue
            if t in (b"K", b"N"):  # BackendKeyData/Notice
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
            elif t == b"S":  # ParameterStatus (e.g. after SET)
                self._param_status(payload)
            elif t in (b"C", b"I", b"N", b"A"):
                continue  # CommandComplete/Empty/Notice/Notify
            elif t == b"E":
                error = error or self._parse_error(payload)
            elif t == b"Z":
                break
            else:
                raise InterfaceError(f"unexpected message {t!r}")
        if error:
            raise DatabaseError(error)
        return description, rows

    def _copy_in(self, sql: str, chunks) -> int:
        """``COPY ... FROM STDIN``: send the Query, stream CopyData
        frames, CopyDone, then drain to ReadyForQuery. Returns the
        row count from CommandComplete ("COPY n"). On a mid-stream
        ErrorResponse the remaining data is not sent (the server
        discards CopyData after an error anyway); the error is raised
        after the drain so the connection stays usable."""
        self._send(b"Q", sql.encode() + b"\x00")
        error: str | None = None
        in_copy = False
        while True:  # wait for CopyInResponse (or an early error)
            t, payload = self._recv_message()
            if t == b"G":  # CopyInResponse
                in_copy = True
                break
            if t == b"E":
                error = self._parse_error(payload)
            elif t == b"Z":
                break
            elif t == b"S":
                self._param_status(payload)
            elif t not in (b"N", b"C", b"I", b"A"):
                raise InterfaceError(f"unexpected message {t!r} before copy")
        if in_copy:
            try:
                for chunk in chunks:
                    self._send(b"d", chunk)  # CopyData
                self._send(b"c", b"")  # CopyDone
            except Exception as exc:
                # Encoder/iterator failure mid-stream: the server is
                # still in copy-in state, so a plain re-raise would
                # leave the connection wedged (any later 'Q' is an
                # unexpected message during COPY). Send CopyFail and
                # drain to ReadyForQuery so the connection stays
                # usable, then propagate the original error.
                reason = str(exc)[:200].encode("utf-8", "replace")
                # The recovery itself may fail — if the original
                # exception WAS a socket death, _send/_recv here raise
                # again (or the drain would block on a half-dead peer,
                # bounded only by the per-recv socket timeout). Never
                # let that secondary failure mask the row-source error:
                # swallow it, mark the connection unusable, and re-raise
                # the original. The drain is also message-count-bounded
                # so a misbehaving peer can't pin the thread forever.
                try:
                    self._send(b"f", reason + b"\x00")  # CopyFail
                    for _ in range(10_000):
                        t, payload = self._recv_message()
                        if t == b"Z":
                            break
                        if t == b"S":
                            self._param_status(payload)
                        # 'E' (the server acknowledging CopyFail), 'N',
                        # 'C', 'A' are all drained silently: the
                        # client-side exception is the error the caller
                        # needs to see.
                    else:
                        self.close()
                except Exception:
                    self.close()
                raise
        rowcount = 0
        if in_copy:
            while True:
                t, payload = self._recv_message()
                if t == b"C":  # CommandComplete: b"COPY <n>\x00"
                    tag = payload.rstrip(b"\x00").decode()
                    if tag.startswith("COPY "):
                        rowcount = int(tag.split()[1])
                elif t == b"E":
                    error = error or self._parse_error(payload)
                elif t == b"S":
                    self._param_status(payload)
                elif t == b"Z":
                    break
                elif t not in (b"N", b"A", b"I"):
                    raise InterfaceError(f"unexpected message {t!r} in copy")
        if error:
            raise DatabaseError(error)
        return rowcount

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
