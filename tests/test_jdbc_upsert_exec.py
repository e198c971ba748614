"""Exercise the Postgres-dialect upsert branch (``sinks/jdbc.py``
``foreach_partition_upsert``) by ASSERTION, not just SQL-string
syntax: the sandbox has no Postgres server or client, so a recording
fake ``psycopg2`` is shipped to the Python workers via ``addPyFile``
and the real executor-side code path runs end-to-end through
``foreachPartition`` — connection DSN, statement text, parameter
batching, commit and close are all captured to disk by the workers
and asserted here.

Golden statements mirror the reference's load phase byte-for-byte
(``/root/reference/etl_process.py:36-41`` tbl_planos,
``:70-78`` tbl_clientes).
"""

from __future__ import annotations

import json
import os

import pytest

from etl_xlsx_potgres_spark.sinks import build_upsert_sql
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


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("psycopg2") is not None,
    reason="real psycopg2 present; the recording fake must not shadow it",
)
def test_foreach_partition_upsert_executes_reference_statements(
    spark, tmp_path
):
    log_path = str(tmp_path / "psycopg2_calls.jsonl")
    fake = tmp_path / "psycopg2.py"
    fake.write_text(_FAKE_PSYCOPG2.format(log_path=log_path))
    # ships the fake to every Python worker for the session — harmless
    # beyond this test because nothing else imports psycopg2 here
    # (the live-Postgres suite is env-gated off in this sandbox)
    spark.sparkContext.addPyFile(str(fake))

    rows = [(f"PLANO_{i}", 99.9) for i in range(7)]
    df = spark.createDataFrame(rows, ["descricao", "valor"]).repartition(2)
    target = JdbcTarget(
        url="jdbc:postgresql://localhost:5432/etl_tsmx", table="tbl_planos"
    )
    foreach_partition_upsert(
        df, target, conflict_keys=["descricao"], batch_rows=3
    )

    assert os.path.exists(log_path), "workers never reached the fake driver"
    events = [
        json.loads(line) for line in open(log_path) if line.strip()
    ]
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
