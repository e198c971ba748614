"""End-to-end test of the xlsx->postgres pipeline over a synthetic
clone of the reference workbook (FIXTURES.md §A1: 1200 rows, 20 cols,
2 duplicate CPF keys, nulls in UF/Plano, float-typed phone columns).

Asserts the reference's observable outcomes: 1198 rows after keyed
dedup (BASELINE.md), the planos dimension cardinality, contact
unpivot counts, and null-default fills."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_xlsx_potgres_spark.pipelines import build_outputs, transform


@pytest.fixture(scope="module")
def workbook_clone(spark):
    n = 1200
    rows = []
    for i in range(n):
        cpf = f"{i:09d}-{i % 97:02d}"
        rows.append(
            {
                "Nome/Razão Social": f"Cliente {i}",
                "Nome Fantasia": None,
                "CPF/CNPJ": cpf,
                "Data Nasc.": datetime.datetime(1980, 1, 1)
                + datetime.timedelta(days=i * 7)
                if i % 3
                else None,
                "Data Cadastro cliente": datetime.datetime(2020, 1, 1)
                + datetime.timedelta(days=i),
                "Celulares": 5581000000000.0 + i if i % 9 else None,
                "Telefones": 8133330000.0 + i if i % 2 else None,
                "Emails": f"c{i}@example.com" if i % 11 else None,
                "Endereço": f"Rua {i}",
                "Número": str(i),
                "Complemento": None if i % 5 else "fundos",
                "Bairro": "Centro",
                "CEP": f"50000-{i % 1000:03d}",
                "Cidade": "Recife",
                "UF": None if i % 100 == 7 else "Pernambuco",
                "Plano": None if i % 200 == 3 else f"PLANO_{i % 16}",
                "Plano Valor": 99.9 + (i % 16),
                "Vencimento": [5, 10, 15, 20, 25][i % 5],
                "Status": "Velocidade Reduzida" if i % 10 else "Ativo",
                "Isento": "Sim" if i % 300 == 0 else None,
            }
        )
    # two duplicated CPF keys -> 1200 rows but 1198 distinct
    rows[500]["CPF/CNPJ"] = rows[100]["CPF/CNPJ"]
    rows[900]["CPF/CNPJ"] = rows[200]["CPF/CNPJ"]
    pdf = pd.DataFrame(rows)
    return spark.createDataFrame(pdf)


def test_transform_dedup_and_defaults(spark, workbook_clone):
    cleaned = transform(workbook_clone).cache()
    assert cleaned.count() == 1198  # BASELINE.md: 1200 -> 1198
    assert cleaned.filter(F.col("UF").isNull() | F.col("Plano").isNull()).count() == 0
    assert cleaned.filter(F.col("UF") == "Desconhecido").count() > 0
    assert cleaned.filter(F.col("Plano") == "Plano Desconhecido").count() > 0
    # digits-only clean really stripped the separators
    assert cleaned.filter(F.col("cpf_cnpj").rlike(r"\D")).count() == 0
    # honest phone handling: no "nan" artifacts, no float suffix
    assert cleaned.filter(F.col("Celulares") == "nan").count() == 0


def test_outputs_shapes(spark, workbook_clone):
    cleaned = transform(workbook_clone).cache()
    out = build_outputs(cleaned)

    assert out["clientes"].count() == 1198
    # 16 real plans + "Plano Desconhecido"
    planos = out["planos"].toPandas()
    assert len(planos) == 17
    assert planos["descricao"].is_unique

    contratos = out["contratos"].cache()
    assert contratos.count() == 1198
    assert contratos.filter(F.length("endereco_uf") > 2).count() == 0
    assert contratos.filter(F.col("dia_vencimento").isin(5, 10, 15, 20, 25)).count() == 1198
    # reference hard-codes these (etl_process.py:120,:123)
    assert contratos.filter((F.col("status_id") != 1) | F.col("isento")).count() == 0

    # every surviving row contributes its non-null contacts
    cleaned_pd = cleaned.select("Telefones", "Celulares", "Emails").toPandas()
    expected = int(
        (cleaned_pd["Telefones"].notna() & (cleaned_pd["Telefones"] != "")).sum()
        + (cleaned_pd["Celulares"].notna() & (cleaned_pd["Celulares"] != "")).sum()
        + cleaned_pd["Emails"].notna().sum()
    )
    assert out["contatos"].count() == expected
    # all quarantine channels empty on a self-consistent workbook
    assert out["quarantine_contratos"].count() == 0

    m = out["metrics"].collect()[0]
    assert m.registros == 1198 and m.clientes_distintos == 1198


def test_honest_flags_mode(spark, workbook_clone):
    cleaned = transform(workbook_clone).cache()
    out = build_outputs(cleaned, honest_flags=True)
    contratos = out["contratos"].cache()
    # "Velocidade Reduzida" maps to status 2 for ~90% of rows
    assert contratos.filter(F.col("status_id") == 2).count() > 1000
    assert contratos.filter(F.col("isento")).count() > 0


def test_legacy_phone_quirk_replicated(spark, workbook_clone):
    """Fidelity mode reproduces the reference's str(float) artifacts
    (etl_process.py:15: NaN -> 'nan', trailing '.0')."""
    cleaned = transform(workbook_clone, legacy_phone_quirk=True)
    phones = cleaned.select("Celulares").toPandas()["Celulares"]
    assert (phones == "nan").any()
    assert phones.str.endswith(".0").any()


def test_upsert_sql_builder():
    from etl_xlsx_potgres_spark.sinks import build_upsert_sql

    sql = build_upsert_sql("tbl_planos", ["descricao", "valor"], ["descricao"])
    assert sql == (
        "INSERT INTO tbl_planos (descricao, valor) VALUES (%s, %s) "
        "ON CONFLICT (descricao) DO NOTHING"
    )
    sql_up = build_upsert_sql("t", ["k", "a", "b"], ["k"], do_update=True)
    assert sql_up.endswith("DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b")


def test_upsert_sql_builder_quoted_mixed_case():
    """Mixed-case / exotic identifiers (the workbook's pre-normalize
    headers are exactly this shape) must be double-quoted or Postgres
    case-folds them and the ON CONFLICT target misses the constraint;
    plain lowercase stays unquoted, byte-identical to the reference's
    statements (etl_process.py:75)."""
    from etl_xlsx_potgres_spark.sinks import build_upsert_sql
    from etl_xlsx_potgres_spark.sinks.jdbc import quote_ident

    assert quote_ident("descricao") == "descricao"
    assert quote_ident("Descricao") == '"Descricao"'
    assert quote_ident("data nasc") == '"data nasc"'
    assert quote_ident('we"ird') == '"we""ird"'

    sql = build_upsert_sql(
        "public.Tbl_Planos", ["Descricao", "valor"], ["Descricao"]
    )
    assert sql == (
        'INSERT INTO public."Tbl_Planos" ("Descricao", valor) '
        'VALUES (%s, %s) ON CONFLICT ("Descricao") DO NOTHING'
    )

    sql_up = build_upsert_sql(
        "t", ["CPF/CNPJ", "Valor", "nome"], ["CPF/CNPJ"], do_update=True
    )
    assert sql_up.endswith(
        'ON CONFLICT ("CPF/CNPJ") DO UPDATE SET '
        '"Valor" = EXCLUDED."Valor", nome = EXCLUDED.nome'
    )


def test_excel_source_intake_validation(spark, tmp_path):
    """Intake validation semantics (exists / .xlsx / landing copy);
    reading itself no longer needs openpyxl (stdlib OOXML fallback —
    see tests/test_xlsx_stdlib.py), but a corrupt container must still
    fail loudly, not silently yield rows."""
    from etl_xlsx_potgres_spark.sources import excel

    p = tmp_path / "in.xlsx"
    p.write_bytes(b"PK\x03\x04fake")
    landed = excel.validate_intake(str(p), str(tmp_path / "uploads"))
    assert landed.endswith("in.xlsx")
    bad = tmp_path / "in.csv"
    bad.write_bytes(b"a,b\n")
    with pytest.raises(ValueError):
        excel.validate_intake(str(bad), str(tmp_path / "uploads"))
    with pytest.raises(Exception):  # truncated zip: BadZipFile either path
        excel.sheet_names(str(p))


def test_observation_metrics(spark, workbook_clone):
    from etl_xlsx_potgres_spark.pipelines.etl_xlsx_postgres import (
        transform_with_observation,
    )

    cleaned, obs = transform_with_observation(workbook_clone)
    n = cleaned.count()  # single action computes result AND metrics
    m = obs.get
    assert m["rows_in"] == 1200 and n == 1198
    assert m["null_planos"] == 6  # i % 200 == 3 seeds
    assert abs(m["approx_keys_in"] - 1198) / 1198 < 0.05
