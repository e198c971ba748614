"""Regenerate GREEN_STAMPS.json — the invalidation ledger behind
``__spark_entry__._verified_green``.

A driver CORRECTNESS green verdict is only trusted while the query's
source (its module + the shared data-layer core) and the oracle-SF
fixtures are unchanged since verification. This tool records those
hashes for names that were ACTUALLY verified against the current state
— pass it a strict_check sweep output, never stamp blind:

    python tools/strict_check.py --out /tmp/sweep.json
    python tools/stamp_green.py --from-sweep /tmp/sweep.json

Only non-vacuous passes (and legitimately oracle-less rows that
returned rows) are stamped. ``--names a,b,c`` stamps an explicit subset
(e.g. after a targeted strict_check run); existing stamps for other
names are preserved unless the fixture fingerprint changed, which
voids the whole ledger.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from etl_xlsx_potgres_spark import registry  # noqa: E402


def _passing_names(sweep: dict) -> list[str]:
    names = []
    for name, row in sweep.items():
        if name == "_meta" or not isinstance(row, dict) or row.get("vacuous"):
            continue
        if row.get("err") == "no_oracle":
            if name not in registry.ORACLES and (row.get("spark_rows") or 0) > 0:
                names.append(name)
        elif row.get("hash_match"):
            names.append(name)
    return names


def _filter_stale(names: list[str], meta: dict) -> list[str]:
    """Drop names whose source or fixtures changed since the sweep ran —
    stamping them would mark unverified code green, the exact hazard the
    ledger exists to prevent."""
    if meta.get("fixture") != entry_mod.fixture_fingerprint():
        print("REFUSING all: oracle-SF fixtures changed since the sweep "
              "(or the sweep ran at a different --sf); re-run strict_check")
        return []
    swept = meta.get("source_hashes", {})
    fresh, stale = [], []
    for n in names:
        (fresh if swept.get(n) == entry_mod._source_hash(n) else stale).append(n)
    if stale:
        print(f"REFUSING {len(stale)} names whose source changed since the "
              f"sweep: {', '.join(sorted(stale)[:10])}"
              f"{'…' if len(stale) > 10 else ''}")
    return fresh


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--from-sweep", default=None,
                    help="strict_check --out json; stamps its passing names")
    ap.add_argument("--names", default=None, help="comma-separated subset")
    args = ap.parse_args()

    registry.load_all()
    if args.from_sweep:
        with open(args.from_sweep) as f:
            sweep = json.load(f)
        names = _passing_names(sweep)
        if "_meta" in sweep:
            names = _filter_stale(names, sweep["_meta"])
        else:
            print("warning: sweep has no _meta (old strict_check?) — "
                  "stamping against CURRENT state; ensure nothing changed "
                  "since the sweep ran")
    elif args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
    else:
        ap.error("pass --from-sweep or --names (never stamp blind)")

    unknown = [n for n in names if n not in registry.QUERIES]
    if unknown:
        ap.error(f"not in registry: {unknown}")

    fp = entry_mod.fixture_fingerprint()
    ledger = entry_mod._load_stamps()
    if ledger["fixture"] != fp:
        # fixtures changed since the last ledger: every old stamp is void
        ledger = {"fixture": fp, "stamps": {}}
    core = entry_mod._core_hash()
    for n in names:
        ledger["stamps"][n] = entry_mod._source_hash(n, core)

    with open(entry_mod._stamps_path(), "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"stamped {len(names)} names; ledger now {len(ledger['stamps'])} "
          f"entries, fixture={fp[:12]}…")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
