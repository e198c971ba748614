"""bench.py's load_flag must self-identify loaded runs: the driver's
r15 bench (start 3.33, in-run up to 7.19 on 32 cpus) passed the old
two-part check yet ran 1.17x the quiet anchor.  These are the two
COMMITTED loadavg profiles (BENCH_FULL.json at d7bd85d = quiet anchor,
at d3b2665 = loaded driver run) — the flag must separate exactly them,
plus the synthetic edges of each rule."""

from __future__ import annotations

import bench

QUIET_R15_ANCHOR = [0.18, 2.82, 4.33, 4.22, 5.72]  # flag must be False
LOADED_R15_DRIVER = [3.33, 6.62, 5.15, 4.61, 7.19]  # flag must be True
CPUS = 32


def test_quiet_anchor_profile_not_flagged():
    assert bench.load_flag(QUIET_R15_ANCHOR, CPUS) is False


def test_loaded_driver_replay_flagged():
    # the r15 failure mode: start under the 0.15*cpus gate, no sample
    # above cpus, but persistently elevated between passes
    assert bench.load_flag(LOADED_R15_DRIVER, CPUS) is True


def test_start_gate_still_fires():
    assert bench.load_flag([0.16 * CPUS, 1.0, 1.0], CPUS) is True


def test_absolute_ceiling_still_fires():
    assert bench.load_flag([0.1, 1.0, CPUS + 1.0], CPUS) is True


def test_single_transient_spike_not_flagged():
    # one in-run sample above the own-load ceiling is the bench's own
    # burst; only persistence (>= half the samples) flags
    assert bench.load_flag([0.1, 1.0, 1.2, 1.1, 0.18 * CPUS + 1], CPUS) is False


def test_malformed_anchor_values_degrade_to_none(tmp_path, monkeypatch):
    """A committed anchor whose query values are non-numeric must not
    crash the bench's diagnostics block (ADVICE r15: TypeError inside
    sorted() escaped the except tuple)."""
    import json

    bad = tmp_path / "anchor.json"
    bad.write_text(json.dumps({"value": 1.0, "queries": {"q1": "oops"}}))
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ANCHOR", str(bad))
    # replicate the ratio block's core expression on the bad anchor
    aq = json.load(open(bad))["queries"]
    times = {"q1": 1.0}
    pairs = sorted(
        (round(times[n] / aq[n], 3), n)
        for n in times
        if n in aq and isinstance(aq[n], (int, float)) and aq[n] > 0
    )
    assert pairs == []
