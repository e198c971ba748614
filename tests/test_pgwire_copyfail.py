"""CopyFail recovery hardening (ADVICE r13): when the row-source
exception that aborted a COPY was itself a connection death, the
CopyFail send / drain raises AGAIN — that secondary failure must
never mask the original error, and the connection must be marked
unusable instead of left wedged. Pure-unit: the Connection is built
uninitialized and its wire primitives stubbed, no server needed."""

from __future__ import annotations

import pytest

from etl_xlsx_potgres_spark.sinks import pgwire


def _bare_conn():
    conn = object.__new__(pgwire.Connection)
    conn.parameters = {}
    conn._in_tx = False
    return conn


def _failing_chunks(n_good: int = 1):
    def gen():
        for i in range(n_good):
            yield b"a\t1\n"
        raise ValueError("row source failed")

    return gen()


def test_secondary_send_failure_does_not_mask_original():
    conn = _bare_conn()
    closed = []
    conn.close = lambda: closed.append(True)

    def send(t, payload):
        if t == b"f":  # the CopyFail hits the dead socket
            raise OSError("broken pipe")

    conn._send = send
    conn._recv_message = lambda: (b"G", b"")  # CopyInResponse
    with pytest.raises(ValueError, match="row source failed"):
        conn._copy_in("COPY t FROM STDIN", _failing_chunks())
    assert closed, "connection must be marked unusable after failed recovery"


def test_unbounded_drain_is_bounded():
    """A peer that never sends ReadyForQuery cannot pin the thread:
    the drain is message-count-bounded and the connection is closed."""
    conn = _bare_conn()
    closed = []
    conn.close = lambda: closed.append(True)
    conn._send = lambda t, payload: None
    state = {"copying": True}

    def recv():
        if state["copying"]:
            state["copying"] = False
            return (b"G", b"")
        return (b"N", b"")  # notices forever, never ReadyForQuery

    conn._recv_message = recv
    with pytest.raises(ValueError, match="row source failed"):
        conn._copy_in("COPY t FROM STDIN", _failing_chunks())
    assert closed


def test_healthy_recovery_keeps_connection_open():
    """The normal path is untouched: CopyFail sends, the server acks
    with an error + ReadyForQuery, the original exception propagates
    and the connection stays usable (close not called)."""
    conn = _bare_conn()
    closed = []
    conn.close = lambda: closed.append(True)
    sent = []
    conn._send = lambda t, payload: sent.append(t)
    msgs = [(b"G", b""), (b"E", b"SERROR\x00Mcopy aborted\x00\x00"), (b"Z", b"I")]
    conn._recv_message = lambda: msgs.pop(0)
    with pytest.raises(ValueError, match="row source failed"):
        conn._copy_in("COPY t FROM STDIN", _failing_chunks())
    assert b"f" in sent, "CopyFail must have been sent"
    assert not closed
