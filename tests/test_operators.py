"""Property tests for operators whose guarantees the SQL oracle can't
express: idempotency, determinism under repartitioning, partition
completeness, ANN recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_xlsx_potgres_spark.operators import (
    dedup_deterministic,
    new_rows,
    validate_split,
)
from etl_xlsx_potgres_spark.sources import load_table


def test_upsert_idempotent(spark, sf_dir):
    """Loading twice == loading once: after the first 'insert', a
    second pass finds nothing new."""
    c = load_table(spark, sf_dir, "customer")
    existing = c.filter(F.col("c_custkey") % 3 == 0)
    first = new_rows(c, existing, ["c_custkey"])
    target_after = existing.select(*c.columns).unionAll(first)
    second = new_rows(c, target_after, ["c_custkey"])
    assert second.count() == 0
    assert target_after.count() == c.count()


def test_dedup_deterministic_under_repartition(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    keys = ["o_custkey"]
    order = [F.col("o_orderdate"), F.col("o_orderkey")]
    a = dedup_deterministic(o, keys, order).select("o_custkey", "o_orderkey")
    b = dedup_deterministic(o.repartition(17), keys, order).select(
        "o_custkey", "o_orderkey"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_validate_split_partitions_input(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rules = [
        ("bad qty", F.col("l_quantity") > 0),
        ("bad discount", F.col("l_discount") <= 0.06),
    ]
    valid, quarantine = validate_split(li, rules)
    assert valid.count() + quarantine.count() == li.count()
    # first-failing-rule wins: no quarantine row without a reason
    assert quarantine.filter(F.col("erro").isNull()).count() == 0


def test_multimodal_decode_deterministic(spark, sf_dir):
    from etl_xlsx_potgres_spark.operators.multimodal import (
        attach_binary_payload,
        decode_image_meta,
    )

    d = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    m1 = decode_image_meta(d).toPandas().sort_values("doc_id").reset_index(drop=True)
    m2 = (
        decode_image_meta(d.repartition(7))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert m1.equals(m2)
    assert len(m1) == d.count()
    assert set(m1.columns) == {"doc_id", "n_bytes", "content_md5", "width", "height", "channels"}
    assert (m1.width % 16 == 0).all() and m1.channels.between(1, 4).all()


def test_multimodal_real_decode_rejects_non_images(spark, sf_dir):
    """decode_image_real is a REAL decoder now (stdlib PNM/BMP, PIL
    when importable): feeding it non-image payloads must fail loudly,
    not fake metadata. The happy path lives in
    tests/test_multimodal_decode.py and the mm_decode_image_real
    oracle query."""
    import pytest

    from etl_xlsx_potgres_spark.operators.multimodal import (
        attach_binary_payload,
        decode_image_real,
    )

    d = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    with pytest.raises(Exception, match="unsupported image format"):
        decode_image_real(d).collect()


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    """LSH probes one bucket (~1/2^planes of the corpus) yet must keep
    reasonable top-5 recall: near-duplicates land in the same bucket
    by construction."""
    from etl_xlsx_potgres_spark.registry import QUERIES, load_all

    load_all()
    exact = QUERIES["ann_cosine_topk"](spark, sf_dir).toPandas()
    approx = QUERIES["ann_lsh_topk"](spark, sf_dir).toPandas()
    exact_sets = exact.groupby("qid")["vec_id"].apply(set)
    approx_sets = approx.groupby("qid")["vec_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    mean_recall = sum(recalls) / len(recalls)
    # near-orthogonal random 64-dim vectors are LSH's worst case;
    # multi-probe (own bucket + 4 Hamming-1 flips) measured ~0.3-0.5
    # here — the floor guards against the bucketing silently breaking
    assert mean_recall >= 0.15, f"LSH recall collapsed: {mean_recall:.2f}"


def test_streaming_matches_batch(spark, sf_dir):
    """Streaming tumbling agg on a bounded input == batch tumbling agg."""
    from etl_xlsx_potgres_spark.registry import QUERIES, load_all

    load_all()
    batch = QUERIES["ts_tumbling_agg"](spark, sf_dir).toPandas()
    stream = QUERIES["streaming_tumbling_agg"](spark, sf_dir).toPandas()
    key = ["bucket", "event_type"]
    batch = batch.sort_values(key).reset_index(drop=True)
    stream = stream[batch.columns].sort_values(key).reset_index(drop=True)
    assert batch.equals(stream)


def test_cogrouped_asof_matches_window_asof(spark, sf_dir):
    """The pd.merge_asof cogrouped implementation and the native
    union+window implementation must agree row-for-row."""
    from etl_xlsx_potgres_spark.registry import QUERIES, load_all

    load_all()
    native = (
        QUERIES["join_asof_purchase_click"](spark, sf_dir)
        .toPandas()
        .sort_values("purchase_id")
        .reset_index(drop=True)
    )
    # the cogrouped query is scoped to the user_id % 10 == 3 cohort
    native = (
        native[native.user_id % 10 == 3].reset_index(drop=True)
    )
    cogrouped = (
        QUERIES["join_asof_cogrouped"](spark, sf_dir)
        .toPandas()
        .sort_values("purchase_id")
        .reset_index(drop=True)
    )
    cols = ["purchase_id", "user_id", "click_id", "click_ts"]
    # click_id dtype depends on whether the frame happens to contain
    # nulls (int64 vs float64); compare values, not inferred dtypes
    native["click_id"] = native["click_id"].astype("float64")
    cogrouped["click_id"] = cogrouped["click_id"].astype("float64")
    assert native[cols].equals(cogrouped[cols])


def test_pagerank_mass_conserved(spark, sf_dir):
    """PageRank invariants: ranks sum to ~1 over all vertices, all
    positive, deterministic ordering in the top-k output."""
    from etl_xlsx_potgres_spark.plans.graph_iterative import pagerank
    from etl_xlsx_potgres_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), (-F.col("l_suppkey") - 1).alias("s"))
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    ranks = pagerank(edges, n_iter=4).toPandas()
    assert abs(ranks["rank"].sum() - 1.0) < 1e-6
    assert (ranks["rank"] > 0).all()


def test_file_format_roundtrip(spark, sf_dir, tmp_path):
    from etl_xlsx_potgres_spark.sources.files import (
        read_csv,
        read_json,
        read_orc,
        write_sorted_parquet,
    )
    from etl_xlsx_potgres_spark.sources import load_table

    c = load_table(spark, sf_dir, "customer")
    schema = "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"

    csv_path = str(tmp_path / "c.csv")
    c.write.option("header", "true").csv(csv_path)
    assert read_csv(spark, csv_path, schema).count() == c.count()

    json_path = str(tmp_path / "c.json")
    c.write.json(json_path)
    assert read_json(spark, json_path, schema).count() == c.count()

    orc_path = str(tmp_path / "c.orc")
    c.write.orc(orc_path)
    assert read_orc(spark, orc_path, schema).count() == c.count()

    pq_path = str(tmp_path / "c_sorted")
    write_sorted_parquet(c, pq_path, ["c_custkey"], target_partitions=4)
    back = spark.read.parquet(pq_path)
    assert back.count() == c.count()
    import glob

    n_files = len(glob.glob(f"{pq_path}/part-*"))
    assert n_files <= 4


def test_ml_brp_lsh_recall_verdicts(spark, sf_dir):
    """The self-verifying BRP-LSH query emits one verdict row per query
    vector, and the LSH candidate set reaches the recall bound against
    the exact euclidean top-k on every one."""
    from etl_xlsx_potgres_spark.plans.similarity import N_QUERIES
    from etl_xlsx_potgres_spark.registry import QUERIES, load_all

    load_all()
    verdicts = QUERIES["ann_ml_brp_lsh"](spark, sf_dir).toPandas()
    assert len(verdicts) == N_QUERIES
    assert verdicts["recall_ok"].all()


def test_ann_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF probes 4 of 16 cells (~25% of the corpus) and must keep
    materially better top-5 recall than a single-bucket LSH probe:
    probing the nearest cells concentrates the true neighbors."""
    from etl_xlsx_potgres_spark.registry import QUERIES, load_all

    load_all()
    exact = QUERIES["ann_cosine_topk"](spark, sf_dir).toPandas()
    approx = QUERIES["ann_ivf_topk"](spark, sf_dir).toPandas()
    exact_sets = exact.groupby("qid")["vec_id"].apply(set)
    approx_sets = approx.groupby("qid")["vec_id"].apply(set)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets.index
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.3, f"IVF recall collapsed: {mean_recall:.2f}"


def test_surrogate_ids_match_global_row_number(spark, sf_dir):
    """The distributed range-sort id assignment must equal the naive
    single-partition window exactly."""
    from pyspark.sql import Window

    from etl_xlsx_potgres_spark.operators.ids import surrogate_ids
    from etl_xlsx_potgres_spark.sources import load_table

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    got = {
        (r.c_custkey, r.sk)
        for r in surrogate_ids(c, ["c_name", "c_custkey"], "sk").collect()
    }
    want = {
        (r.c_custkey, r.sk)
        for r in c.withColumn(
            "sk",
            F.row_number().over(Window.orderBy("c_name", "c_custkey")).cast("long"),
        ).collect()
    }
    assert got == want


def test_global_row_number_honors_desc_and_null_order(spark, sf_dir):
    """Sort-order expressions (desc, nulls-first/last) must survive the
    range partitioner and reproduce the naive global window exactly."""
    from pyspark.sql import Window

    from etl_xlsx_potgres_spark.operators.ids import global_row_number
    from etl_xlsx_potgres_spark.sources import load_table

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    )
    order = [F.col("seg").desc_nulls_last(), F.asc("c_custkey")]
    got = {
        (r.c_custkey, r.rn)
        for r in global_row_number(c, order, "rn").collect()
    }
    want = {
        (r.c_custkey, r.rn)
        for r in c.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order)).cast("long")
        ).collect()
    }
    assert got == want


def test_global_ntile_matches_sql_ntile_on_ragged_count(spark):
    """NTILE front-loads the larger tiles; the distributed formula must
    agree with F.ntile exactly when count % n_tiles != 0."""
    from pyspark.sql import Window

    from etl_xlsx_potgres_spark.operators.ids import global_ntile

    n = 47  # 47 = 4*10 + 7: first 7 deciles get 5 rows, last 3 get 4
    df = spark.range(n).select((F.col("id") * 37 % 101).alias("k"), "id")
    got = {
        (r.id, r.t) for r in global_ntile(df, ["k", "id"], 10, "t").collect()
    }
    want = {
        (r.id, r.t)
        for r in df.withColumn(
            "t", F.ntile(10).over(Window.orderBy("k", "id"))
        ).collect()
    }
    assert got == want


def test_csv_jsonl_declared_schema_quarantine(spark, tmp_path):
    """Quarantine reader variants: declared schema, PERMISSIVE parse,
    split into clean + quarantine instead of dropping or failing."""
    import os

    from pyspark.sql import types as T

    from etl_xlsx_potgres_spark.sources.files import (
        read_csv_quarantine,
        read_jsonl_quarantine,
        split_corrupt,
    )

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    csv_dir = str(tmp_path / "csv")
    os.makedirs(csv_dir)
    with open(os.path.join(csv_dir, "a.csv"), "w") as f:
        f.write("k,v\n1,a\nbad_row,b\n3,c\n")
    clean, bad = split_corrupt(read_csv_quarantine(spark, csv_dir, schema))
    assert clean.count() == 2 and "_corrupt_record" not in clean.columns
    assert bad.count() == 1

    jl_dir = str(tmp_path / "jl")
    os.makedirs(jl_dir)
    with open(os.path.join(jl_dir, "a.jsonl"), "w") as f:
        f.write('{"k": 1, "v": "a"}\n{"k": "oops", "v": "b"}\nnot json\n')
    clean_j, bad_j = split_corrupt(read_jsonl_quarantine(spark, jl_dir, schema))
    assert clean_j.count() == 1
    assert bad_j.count() == 2  # type mismatch + malformed line
