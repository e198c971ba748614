"""Environment-gated integration tests for the two runtime paths this
container cannot exercise (no openpyxl, no Postgres). They skip
cleanly here and run automatically wherever the dependency exists:

- Excel: ``pytest.importorskip("openpyxl")`` — real workbook write →
  intake → sheet enumeration → Spark read → parquet edge conversion.
- Postgres: needs psycopg2 AND a live server named by
  ``SPARK_GRAFT_PG_URL`` (e.g. ``jdbc:postgresql://localhost:5432/
  etl_tsmx?user=postgres&password=...``) — full insert-if-absent
  round-trip through the JDBC sink.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_excel_roundtrip_when_openpyxl_present(spark, tmp_path):
    openpyxl = pytest.importorskip("openpyxl")

    from etl_xlsx_potgres_spark.sources import excel

    wb = openpyxl.Workbook()
    ws = wb.active
    ws.title = "Plan1"
    ws.append(["Nome/Razão Social", "CPF/CNPJ", "Plano Valor"])
    ws.append(["Cliente 1", "123456789-01", 99.9])
    ws.append(["Cliente 2", "987654321-09", 49.9])
    src = tmp_path / "clientes.xlsx"
    wb.save(src)

    landed = excel.validate_intake(str(src), str(tmp_path / "landing"))
    assert excel.sheet_names(landed) == ["Plan1"]

    df = excel.read_workbook(spark, landed, sheet="Plan1")
    assert df.count() == 2
    assert set(df.columns) == {"Nome/Razão Social", "CPF/CNPJ", "Plano Valor"}

    prev = excel.preview(spark, landed, n=1)
    assert len(prev["Plan1"]) == 1

    out = excel.convert_to_parquet(spark, landed, str(tmp_path / "pq"))
    back = spark.read.parquet(out)
    assert back.count() == 2


def test_jdbc_insert_if_absent_roundtrip_when_pg_present(spark):
    pytest.importorskip("psycopg2")
    url = os.environ.get("SPARK_GRAFT_PG_URL")
    if not url:
        pytest.skip("set SPARK_GRAFT_PG_URL to run the live JDBC round-trip")

    import psycopg2

    from etl_xlsx_potgres_spark.sinks import jdbc

    target = jdbc.JdbcTarget(url=url, table="it_upsert_roundtrip")
    conn = psycopg2.connect(target.dbapi_dsn())
    try:
        with conn.cursor() as cur:
            cur.execute("DROP TABLE IF EXISTS it_upsert_roundtrip")
            cur.execute(
                "CREATE TABLE it_upsert_roundtrip (k BIGINT PRIMARY KEY, v TEXT)"
            )
        conn.commit()

        first = spark.range(10).select(
            F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
        )
        jdbc.upsert_insert_if_absent(first, target, keys=["k"])
        # overlapping second load: only the 5 new keys may land
        second = spark.range(5, 15).select(
            F.col("id").alias("k"), F.concat(F.lit("w"), F.col("id")).alias("v")
        )
        jdbc.upsert_insert_if_absent(second, target, keys=["k"])

        with conn.cursor() as cur:
            cur.execute("SELECT COUNT(*), MIN(v), MAX(k) FROM it_upsert_roundtrip")
            n, minv, maxk = cur.fetchone()
        assert n == 15 and maxk == 14
        # keys 5-9 kept their first-load values (insert-if-absent)
        with conn.cursor() as cur:
            cur.execute("SELECT v FROM it_upsert_roundtrip WHERE k = 7")
            assert cur.fetchone()[0] == "v7"
    finally:
        conn.close()


def test_jdbc_append_and_upsert_roundtrip_embedded_derby(spark, tmp_path):
    """LIVE JDBC roundtrip with no external database: Apache Derby
    ships in Spark's jars, so the generic JDBC sink paths — parallel
    batched append (auto-creating the table), key read-back with
    column pruning, and the anti-join insert-if-absent upsert — are
    provable in this environment. The Postgres-specific ON CONFLICT
    statement path stays covered by build_upsert_sql unit tests and
    the env-gated live-PG test above."""
    from etl_xlsx_potgres_spark.sinks import jdbc

    url = f"jdbc:derby:{tmp_path}/etl_db;create=true"
    target = jdbc.JdbcTarget(
        url=url,
        table="it_upsert",
        properties={"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
    )

    first = spark.range(10).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    jdbc.append(first, target, num_partitions=2)

    back = jdbc.read_keys(spark, target, ["k"])
    assert back.count() == 10

    # overlapping second load: only the 5 new keys may land
    second = spark.range(5, 15).select(
        F.col("id").alias("k"), F.concat(F.lit("w"), F.col("id")).alias("v")
    )
    jdbc.upsert_insert_if_absent(second, target, keys=["k"])
    rows = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "it_upsert")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .load()
        .collect()
    )
    by_key = {r["k"]: r["v"] for r in rows}
    assert len(by_key) == 15
    assert by_key[7] == "v7"   # existing key NOT overwritten
    assert by_key[12] == "w12"  # new key landed

    # idempotent: re-running the same upsert adds nothing
    jdbc.upsert_insert_if_absent(second, target, keys=["k"])
    assert jdbc.read_keys(spark, target, ["k"]).count() == 15


def test_full_reference_journey_xlsx_to_database(spark, tmp_path):
    """The reference's complete pipeline, live, with zero external
    dependencies: a genuine .xlsx workbook (stdlib OOXML writer) ->
    intake -> read -> transform (clean/type/dedup) -> normalized
    outputs -> JDBC load into a real database (embedded Derby) ->
    read-back row counts. This is importador.py + etl_process.py end
    to end inside this sandbox."""
    import datetime

    from etl_xlsx_potgres_spark.pipelines import build_outputs, transform
    from etl_xlsx_potgres_spark.sinks import jdbc
    from etl_xlsx_potgres_spark.sources import excel, xlsx_stdlib

    headers = [
        "Nome/Razão Social", "Nome Fantasia", "CPF/CNPJ", "Data Nasc.",
        "Data Cadastro cliente", "Celulares", "Telefones", "Emails",
        "Endereço", "Número", "Complemento", "Bairro", "CEP", "Cidade",
        "UF", "Plano", "Plano Valor", "Vencimento", "Status", "Isento",
    ]
    rows = [
        [f"Cliente {i}", None, f"{i:06d}-{i % 97:02d}",
         datetime.datetime(1985, 3, 1), datetime.datetime(2021, 5, 1),
         5581000000000.0 + i, 8133330000.0 + i, f"c{i}@example.com",
         f"Rua {i}", str(i), None, "Centro", "50000-000", "Recife",
         "Pernambuco", f"PLANO_{i % 4}", 99.9, 10, "Ativo", None]
        for i in range(40)
    ]
    rows[30][2] = rows[10][2]  # one duplicate key -> 39 after dedup

    src = str(tmp_path / "clientes.xlsx")
    xlsx_stdlib.write_xlsx(src, headers, rows)
    landed = excel.validate_intake(src, str(tmp_path / "landing"))

    import pyspark.sql.types as T

    types = [T.StringType(), T.StringType(), T.StringType(),
             T.TimestampType(), T.TimestampType(), T.DoubleType(),
             T.DoubleType(), T.StringType(), T.StringType(),
             T.StringType(), T.StringType(), T.StringType(),
             T.StringType(), T.StringType(), T.StringType(),
             T.StringType(), T.DoubleType(), T.LongType(),
             T.StringType(), T.StringType()]
    schema = T.StructType(
        [T.StructField(h, t) for h, t in zip(headers, types)]
    )
    cleaned = transform(excel.read_workbook(spark, landed, schema=schema)).cache()
    out = build_outputs(cleaned)

    url = f"jdbc:derby:{tmp_path}/refdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    for name in ("planos", "clientes", "contratos", "contatos"):
        jdbc.append(out[name], jdbc.JdbcTarget(url, name, props))

    def count(table):
        return (
            spark.read.format("jdbc").option("url", url)
            .option("dbtable", table).options(**props).load().count()
        )

    assert count("planos") == 4
    assert count("clientes") == 39
    assert count("contratos") == 39
    # every client has celular+telefone+email contacts (3 rows each)
    assert count("contatos") == 39 * 3
