"""Property test for the distributed packing prefix sum: on seeded
synthetic token counts the bucketed two-level layout must equal a
plain python cumsum over the same md5 order — including the shapes
the parquet fixture never produces (empty documents with tok = 0,
documents longer than several SEQ_LEN windows, single-token docs).
"""

from __future__ import annotations

import hashlib
import random

import pytest

from etl_xlsx_potgres_spark.plans.sequence_packing import packed_layout_from


def _python_layout(toks: dict[int, int]) -> dict[int, tuple[int, int]]:
    order = sorted(
        toks, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d)
    )
    pos, out = 0, {}
    for d in order:
        out[d] = (toks[d], pos)
        pos += toks[d]
    return out


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_matches_python_cumsum(spark, seed):
    rng = random.Random(seed)
    toks = {}
    doc_id = 0
    for _ in range(400):
        shape = rng.random()
        if shape < 0.1:
            t = 0                       # empty document
        elif shape < 0.8:
            t = rng.randint(1, 120)     # ordinary
        else:
            t = rng.randint(600, 2000)  # spans many SEQ_LEN windows
        toks[doc_id] = t
        doc_id += rng.randint(1, 5)     # sparse, non-contiguous ids
    want = _python_layout(toks)
    df = spark.createDataFrame(list(toks.items()), "doc_id long, tok long")
    got = {
        r["doc_id"]: (r["tok"], r["start_pos"])
        for r in packed_layout_from(df).collect()
    }
    assert got == want
