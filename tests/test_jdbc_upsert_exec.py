"""Exercise the Postgres-dialect load branch (``sinks/jdbc.py``
``foreach_partition_upsert``) by ASSERTION, not just SQL-string
syntax: the sandbox has no Postgres server or client, so a recording
fake ``psycopg2`` is shipped to the Python workers via ``addPyFile``
and the real executor-side code path runs end-to-end through
``foreachPartition`` — connection DSN, statement text, parameter
batching, commit and close are all captured to disk by the workers
and asserted here.

Golden statements mirror the reference's load phase for ALL FOUR
target tables (``/root/reference/etl_process.py``):

- ``tbl_planos``            :36-41   INSERT ... ON CONFLICT (descricao) DO NOTHING
- ``tbl_clientes``          :70-78   INSERT ... ON CONFLICT (cpf_cnpj) DO NOTHING
- ``tbl_cliente_contratos`` :113-124 plain INSERT (12 columns, no conflict target)
- ``tbl_cliente_contatos``  :167-174 plain INSERT (3 columns, no conflict target)

plus the reference's FK load order planos -> clientes -> contratos ->
contatos (``README.md:118``, mirrored by ``pipelines.build_outputs``).
"""

from __future__ import annotations

import json
import os
import re

import pytest

from etl_xlsx_potgres_spark.sinks import build_insert_sql, build_upsert_sql
from etl_xlsx_potgres_spark.sinks.jdbc import (
    JdbcTarget,
    foreach_partition_upsert,
)

PLANOS_SQL = (
    "INSERT INTO tbl_planos (descricao, valor) VALUES (%s, %s) "
    "ON CONFLICT (descricao) DO NOTHING"
)
CLIENTES_SQL = (
    "INSERT INTO tbl_clientes (nome_razao_social, nome_fantasia, "
    "cpf_cnpj, data_nascimento, data_cadastro) "
    "VALUES (%s, %s, %s, %s, %s) "
    "ON CONFLICT (cpf_cnpj) DO NOTHING"
)
CONTRATOS_COLUMNS = [
    "cliente_id",
    "plano_id",
    "dia_vencimento",
    "isento",
    "endereco_logradouro",
    "endereco_numero",
    "endereco_bairro",
    "endereco_cidade",
    "endereco_complemento",
    "endereco_cep",
    "endereco_uf",
    "status_id",
]
CONTRATOS_SQL = (
    "INSERT INTO tbl_cliente_contratos (cliente_id, plano_id, "
    "dia_vencimento, isento, endereco_logradouro, endereco_numero, "
    "endereco_bairro, endereco_cidade, endereco_complemento, "
    "endereco_cep, endereco_uf, status_id) "
    "VALUES (%s, %s, %s, %s, %s, %s, %s, %s, %s, %s, %s, %s)"
)
CONTATOS_SQL = (
    "INSERT INTO tbl_cliente_contatos (cliente_id, tipo_contato_id, "
    "contato) VALUES (%s, %s, %s)"
)

# The reference's statement text VERBATIM (multi-line, as passed to
# cur.execute) — asserted below against our canonical single-line
# builders modulo whitespace, so column membership + ORDER (and hence
# %s parameter order) are byte-equivalent.
_REF_CONTRATOS_VERBATIM = """
    INSERT INTO tbl_cliente_contratos (
        cliente_id, plano_id, dia_vencimento, isento,
        endereco_logradouro, endereco_numero, endereco_bairro,
        endereco_cidade, endereco_complemento, endereco_cep, endereco_uf, status_id
    ) VALUES (%s, %s, %s, %s, %s, %s, %s, %s, %s, %s, %s, %s)
"""  # etl_process.py:113-118
_REF_CONTATOS_VERBATIM = """
    INSERT INTO tbl_cliente_contatos (cliente_id, tipo_contato_id, contato)
    VALUES (%s, %s, %s)
"""  # etl_process.py:170-173


def _squash(sql: str) -> str:
    """Whitespace-normalized statement form: collapse runs of
    whitespace, drop space adjacent to parens/commas."""
    s = re.sub(r"\s+", " ", sql).strip()
    s = re.sub(r"\s*([(),])\s*", r"\1", s)
    return s


def test_reference_golden_conflict_statements():
    """The two ON CONFLICT statements the reference issues, rebuilt
    from table/column/key metadata — byte-identical."""
    assert (
        build_upsert_sql("tbl_planos", ["descricao", "valor"], ["descricao"])
        == PLANOS_SQL
    )
    assert (
        build_upsert_sql(
            "tbl_clientes",
            [
                "nome_razao_social",
                "nome_fantasia",
                "cpf_cnpj",
                "data_nascimento",
                "data_cadastro",
            ],
            ["cpf_cnpj"],
        )
        == CLIENTES_SQL
    )


def test_reference_golden_plain_insert_statements():
    """The two plain-INSERT statements (contratos/contatos have no
    conflict target in the reference) — our builder's canonical form,
    and whitespace-equivalent to the reference's verbatim text, so
    column order == parameter order is proven against the source."""
    assert build_insert_sql("tbl_cliente_contratos", CONTRATOS_COLUMNS) == CONTRATOS_SQL
    assert (
        build_insert_sql(
            "tbl_cliente_contatos", ["cliente_id", "tipo_contato_id", "contato"]
        )
        == CONTATOS_SQL
    )
    assert _squash(CONTRATOS_SQL) == _squash(_REF_CONTRATOS_VERBATIM)
    assert _squash(CONTATOS_SQL) == _squash(_REF_CONTATOS_VERBATIM)


_FAKE_PSYCOPG2 = '''
"""Recording psycopg2 stand-in (test-only, shipped via addPyFile)."""
import json

_LOG = {log_path!r}


def _emit(event):
    with open(_LOG, "a") as f:
        f.write(json.dumps(event) + "\\n")


class _Cursor:
    def executemany(self, sql, batch):
        _emit({{"op": "executemany", "sql": sql,
               "batch": [list(b) for b in batch]}})

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _Conn:
    def cursor(self):
        return _Cursor()

    def commit(self):
        _emit({{"op": "commit"}})

    def close(self):
        _emit({{"op": "close"}})


def connect(dsn):
    _emit({{"op": "connect", "dsn": dsn}})
    return _Conn()
'''

_skip_if_real_psycopg2 = pytest.mark.skipif(
    __import__("importlib").util.find_spec("psycopg2") is not None,
    reason="real psycopg2 present; the recording fake must not shadow it",
)


@pytest.fixture(scope="session")
def psycopg2_log(spark, tmp_path_factory):
    """Ship ONE recording fake per Spark session (addPyFile rejects
    re-adding a same-named file with different contents) and hand each
    test the shared log path; tests truncate it before use."""
    root = tmp_path_factory.mktemp("fake_psycopg2")
    log_path = str(root / "psycopg2_calls.jsonl")
    fake = root / "psycopg2.py"
    fake.write_text(_FAKE_PSYCOPG2.format(log_path=log_path))
    # harmless beyond these tests because nothing else imports
    # psycopg2 here (the live-Postgres suite is env-gated off)
    spark.sparkContext.addPyFile(str(fake))
    return log_path


def _read_events(log_path):
    assert os.path.exists(log_path), "workers never reached the fake driver"
    with open(log_path) as f:
        return [json.loads(line) for line in f if line.strip()]


@_skip_if_real_psycopg2
def test_foreach_partition_upsert_executes_reference_statements(
    spark, psycopg2_log
):
    open(psycopg2_log, "w").close()

    rows = [(f"PLANO_{i}", 99.9) for i in range(7)]
    df = spark.createDataFrame(rows, ["descricao", "valor"]).repartition(2)
    target = JdbcTarget(
        url="jdbc:postgresql://localhost:5432/etl_tsmx", table="tbl_planos"
    )
    foreach_partition_upsert(
        df, target, conflict_keys=["descricao"], batch_rows=3
    )

    events = _read_events(psycopg2_log)
    connects = [e for e in events if e["op"] == "connect"]
    execs = [e for e in events if e["op"] == "executemany"]

    # DSN is the JDBC url with the jdbc: prefix stripped (DB-API form)
    assert {e["dsn"] for e in connects} == {
        "postgresql://localhost:5432/etl_tsmx"
    }
    # every statement is the reference's exact tbl_planos upsert
    assert {e["sql"] for e in execs} == {PLANOS_SQL}
    # batching: batch_rows=3 bounds every executemany batch
    assert all(1 <= len(e["batch"]) <= 3 for e in execs)
    # all rows arrive exactly once, in (descricao, valor) order
    sent = sorted(tuple(b) for e in execs for b in e["batch"])
    assert sent == sorted(rows)
    # each partition that held rows committed and closed
    n_commits = sum(e["op"] == "commit" for e in events)
    n_closes = sum(e["op"] == "close" for e in events)
    assert n_commits == n_closes == len(connects) == 2


@_skip_if_real_psycopg2
def test_foreach_partition_full_reference_load_sequence(spark, psycopg2_log):
    """All FOUR reference tables through the real foreachPartition
    path in the reference's FK load order — statement text, parameter
    order, and sequencing asserted from the worker-side log."""
    open(psycopg2_log, "w").close()
    url = "jdbc:postgresql://localhost:5432/etl_tsmx"

    planos = spark.createDataFrame(
        [("FIBRA 100MB", 79.9), ("FIBRA 500MB", 129.9)],
        ["descricao", "valor"],
    )
    clientes = spark.createDataFrame(
        [
            ("ACME LTDA", "ACME", "04252011000110", "1990-01-05", "2024-03-01"),
            ("BOB SILVA", "", "52998224725", "1985-11-20", "2024-03-02"),
        ],
        [
            "nome_razao_social",
            "nome_fantasia",
            "cpf_cnpj",
            "data_nascimento",
            "data_cadastro",
        ],
    )
    contratos = spark.createDataFrame(
        [
            (1, 1, 10, False, "Rua A", "12", "Centro", "Recife", "", "50000000", "PE", 1),
            (2, 2, 5, False, "Rua B", "34", "Boa Vista", "Olinda", "ap 2", "53000000", "PE", 1),
        ],
        CONTRATOS_COLUMNS,
    )
    contatos = spark.createDataFrame(
        [(1, 1, "8133334444"), (1, 3, "a@acme.com"), (2, 2, "81999998888")],
        ["cliente_id", "tipo_contato_id", "contato"],
    )

    # the reference's FK dependency order (README.md:118); each
    # foreachPartition is a blocking action, so the log is ordered
    # across loads even with parallel partitions within one load
    foreach_partition_upsert(
        planos, JdbcTarget(url=url, table="tbl_planos"),
        conflict_keys=["descricao"],
    )
    foreach_partition_upsert(
        clientes, JdbcTarget(url=url, table="tbl_clientes"),
        conflict_keys=["cpf_cnpj"],
    )
    foreach_partition_upsert(
        contratos.repartition(2),
        JdbcTarget(url=url, table="tbl_cliente_contratos"),
        conflict_keys=None,  # reference issues a plain INSERT here
    )
    foreach_partition_upsert(
        contatos, JdbcTarget(url=url, table="tbl_cliente_contatos"),
        conflict_keys=None,  # plain INSERT (unique index arbitrates)
    )

    events = _read_events(psycopg2_log)
    execs = [e for e in events if e["op"] == "executemany"]

    # 1) statement text: exactly the four reference statements ran
    assert {e["sql"] for e in execs} == {
        PLANOS_SQL,
        CLIENTES_SQL,
        CONTRATOS_SQL,
        CONTATOS_SQL,
    }

    # 2) FK-load sequencing: every statement of a dependency table
    # ran strictly before any statement of its dependent table
    order = [PLANOS_SQL, CLIENTES_SQL, CONTRATOS_SQL, CONTATOS_SQL]
    first = {s: min(i for i, e in enumerate(execs) if e["sql"] == s) for s in order}
    last = {s: max(i for i, e in enumerate(execs) if e["sql"] == s) for s in order}
    for earlier, later in zip(order, order[1:]):
        assert last[earlier] < first[later], (
            f"{later} statements started before {earlier} finished"
        )

    # 3) parameter order: 12-tuple contratos params arrive in the
    # reference's exact positional order (cliente_id first, status_id
    # last), contatos as (cliente_id, tipo_contato_id, contato)
    contratos_sent = sorted(
        tuple(b) for e in execs if e["sql"] == CONTRATOS_SQL for b in e["batch"]
    )
    assert contratos_sent == sorted(
        (
            (1, 1, 10, False, "Rua A", "12", "Centro", "Recife", "", "50000000", "PE", 1),
            (2, 2, 5, False, "Rua B", "34", "Boa Vista", "Olinda", "ap 2", "53000000", "PE", 1),
        )
    )
    contatos_sent = sorted(
        tuple(b) for e in execs if e["sql"] == CONTATOS_SQL for b in e["batch"]
    )
    assert contatos_sent == [
        (1, 1, "8133334444"),
        (1, 3, "a@acme.com"),
        (2, 2, "81999998888"),
    ]

    # 4) every connection that opened was committed and closed
    n_connect = sum(e["op"] == "connect" for e in events)
    assert n_connect >= 4
    assert (
        sum(e["op"] == "commit" for e in events)
        == sum(e["op"] == "close" for e in events)
        == n_connect
    )


def test_chunk_reader_streams_copy_payload():
    """The psycopg2 copy_expert branch must STREAM the COPY text (one
    chunk + one buffer resident), and reads of any size must
    reassemble the exact payload."""
    from etl_xlsx_potgres_spark.sinks.jdbc import _ChunkReader
    from etl_xlsx_potgres_spark.sinks.pgwire import _copy_encode

    rows = [(i, f"v-{i}\twith\ttabs", None) for i in range(500)]
    expect = b"".join(_copy_encode(rows))

    # varied read sizes, including ones that straddle chunk boundaries
    for size in (1, 7, 64, 8192, 1 << 20):
        r = _ChunkReader(_copy_encode(rows))
        got = b""
        while True:
            part = r.read(size)
            if not part:
                break
            assert len(part) <= size
            got += part
        assert got == expect, f"read({size}) lost/reordered bytes"

    # read(-1) drains everything
    r = _ChunkReader(_copy_encode(rows))
    assert r.read(7) + r.read(-1) == expect

    # readline yields newline-terminated COPY records
    r = _ChunkReader(_copy_encode(rows))
    lines = []
    while True:
        ln = r.readline()
        if not ln:
            break
        lines.append(ln)
    assert b"".join(lines) == expect
    assert len(lines) == len(rows)
    assert all(ln.endswith(b"\n") for ln in lines)


def test_foreach_partition_copy_via_copy_expert(spark, tmp_path):
    """A psycopg2-style cursor (copy_expert, no copy_rows) takes the
    streamed COPY branch and receives the exact payload. Captures go
    through files: the connect closure is pickled to executors, so
    driver-memory capture would record nothing."""
    import glob
    import os
    import uuid

    from etl_xlsx_potgres_spark.sinks.jdbc import (
        JdbcTarget,
        foreach_partition_copy,
    )

    cap_dir = str(tmp_path)

    class _CopyCursor:
        def copy_expert(self, sql, f):
            data = b""
            while True:
                part = f.read(8192)
                if not part:
                    break
                data += part
            out = os.path.join(cap_dir, f"{uuid.uuid4().hex}.copy")
            with open(out, "wb") as fh:
                fh.write(sql.encode() + b"\x00" + data)

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    class _CopyConn:
        def cursor(self):
            return _CopyCursor()

        def commit(self):
            pass

        def close(self):
            pass

    df = spark.range(100).selectExpr(
        "id AS k", "concat('row-', id) AS v"
    ).coalesce(2)
    foreach_partition_copy(
        df,
        JdbcTarget(url="jdbc:postgresql://h:5432/db", table="t"),
        connect=lambda dsn: _CopyConn(),
    )
    captured = []
    for path in glob.glob(os.path.join(cap_dir, "*.copy")):
        with open(path, "rb") as fh:
            sql, _, data = fh.read().partition(b"\x00")
        captured.append((sql.decode(), data))
    assert captured, "copy_expert never invoked"
    assert all(
        sql == "COPY t (k, v) FROM STDIN" for sql, _ in captured
    )
    got = sorted(
        ln for _, data in captured for ln in data.decode().splitlines()
    )
    assert got == sorted(f"{i}\trow-{i}" for i in range(100))
