"""Streaming dedup against the band store: the run must be genuinely
multi-micro-batch, every micro-batch's history scan must be the
bucketed store read IN PLACE (no Exchange anywhere on its tree path),
and the streamed verdicts must equal the one-shot batch query exactly
(batch-wise composition claim)."""

from __future__ import annotations

from etl_xlsx_potgres_spark import registry
from etl_xlsx_potgres_spark.plans import streaming_dedup as sd

registry.load_all()


def _ancestors_up_to_band_join(plan: str) -> list[str]:
    """Lines on the tree path from the band-store FileScan up to (and
    excluding) the first Join that consumes it.  An Exchange HERE would
    mean history was re-shuffled into the probe; Exchanges ABOVE the
    join move only the candidate set and are expected."""
    lines = plan.splitlines()
    scan_i = next(
        i for i, ln in enumerate(lines)
        if "FileScan" in ln and "dedup_band_store" in ln
    )

    def indent(ln: str) -> int:
        for marker in ("+- ", ":- "):
            if marker in ln:
                return ln.index(marker)
        return -1

    cur = indent(lines[scan_i])
    out = []
    for ln in reversed(lines[:scan_i]):
        ind = indent(ln)
        if ind == -1:
            break  # reached the root without meeting a join
        if ind < cur:
            if "Join" in ln:
                break
            out.append(ln)
            cur = ind
    return out


def test_stream_probes_store_in_place_and_matches_batch(spark, sf_dir):
    streamed = registry.QUERIES["streaming_dedup_incremental"](
        spark, sf_dir
    ).collect()

    # genuinely multi-batch
    assert len(sd.LAST_BATCH_PLANS) == sd.N_FILES

    for plan in sd.LAST_BATCH_PLANS:
        assert "Bucketed: true" in plan, plan
        ancestors = _ancestors_up_to_band_join(plan)
        offending = [ln for ln in ancestors if "Exchange" in ln]
        assert not offending, (
            "history store shuffled inside a micro-batch:\n"
            + "\n".join(offending)
        )

    # stream == batch, bit-for-bit
    batch = registry.QUERIES["dedup_incremental_newbatch"](
        spark, sf_dir
    ).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(map(tuple, streamed), key=lambda t: t[0]) == sorted(
        map(tuple, batch), key=lambda t: t[0]
    )
