"""Generate the driver-gate verification ledger from CORRECTNESS_r*.json.

The driver's gate window holds only 50 queries per round while the
oracle catalog is ~4× that, so full driver re-verification is a
multi-round rotation. The rotation input used to be hand-maintained
comment prose in ``registry.py`` — a counting slip recurred twice
(r6, r7 gate ledgers). This tool computes it: for every oracle-backed
query in the catalog it prints ``(last_green_round, green_count)``
from the actual driver records, plus the never-driver-verified set
and a suggested next-window cohort (never-verified first, then
least-recently / least-often green).

Usage:
    python tools/gate_coverage.py            # human table
    python tools/gate_coverage.py --json     # machine-readable
    python tools/gate_coverage.py --suggest  # proposed next 50-query gate
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_history() -> dict[str, dict[int, bool]]:
    """query -> {round: fully_green}. Green = rows+schema+hash all true."""
    hist: dict[str, dict[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            records = json.load(f)
        for name, rec in records.items():
            green = bool(
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
                and rec.get("err") is None
            )
            hist.setdefault(name, {})[rnd] = green
    return hist


def catalog() -> tuple[list[str], set[str]]:
    """(ordered oracle-backed query names, rows-only names) from the registry."""
    sys.path.insert(0, REPO)
    from databridge_etl_tools_spark import registry

    registry.load_all()
    oracle_backed = [n for n in registry.QUERIES if n in registry.ORACLES]
    rows_only = {n for n in registry.QUERIES if n not in registry.ORACLES}
    return oracle_backed, rows_only


def ledger() -> dict[str, dict]:
    """Per-oracle-query ledger merging catalog + driver history."""
    names, _ = catalog()
    hist = load_history()
    out: dict[str, dict] = {}
    for n in names:
        rounds = hist.get(n, {})
        greens = sorted(r for r, ok in rounds.items() if ok)
        out[n] = {
            "green_count": len(greens),
            "last_green_round": greens[-1] if greens else None,
            "ever_failed_rounds": sorted(r for r, ok in rounds.items() if not ok),
        }
    return out

def suggest(led: dict[str, dict], window: int = 50) -> list[str]:
    """Next-window cohort: never-green first (registration order), then
    ascending (last_green_round, green_count, name)."""
    never = [n for n, e in led.items() if e["green_count"] == 0]
    seen = sorted(
        (n for n, e in led.items() if e["green_count"] > 0),
        key=lambda n: (led[n]["last_green_round"], led[n]["green_count"], n),
    )
    return (never + seen)[:window]


def main() -> None:
    led = ledger()
    if "--json" in sys.argv:
        print(json.dumps(led, indent=1, sort_keys=True))
        return
    if "--suggest" in sys.argv:
        for n in suggest(led):
            e = led[n]
            print(f"{n}\tlast_green=r{e['last_green_round']}\tgreens={e['green_count']}")
        return
    never = [n for n, e in led.items() if e["green_count"] == 0]
    print(f"oracle catalog: {len(led)} queries; never driver-green: {len(never)}")
    for n in never:
        print(f"  NEVER  {n}")
    by_recency: dict[int, list[str]] = {}
    for n, e in led.items():
        if e["green_count"]:
            by_recency.setdefault(e["last_green_round"], []).append(n)
    for rnd in sorted(by_recency):
        qs = by_recency[rnd]
        print(f"last green r{rnd}: {len(qs)} queries")
        for n in sorted(qs, key=lambda n: (led[n]["green_count"], n)):
            print(f"  r{rnd}x{led[n]['green_count']}  {n}")
    failed = {n: e for n, e in led.items() if e["ever_failed_rounds"]}
    if failed:
        print("ever-failed rounds:")
        for n, e in failed.items():
            print(f"  {n}: {e['ever_failed_rounds']}")


if __name__ == "__main__":
    main()
