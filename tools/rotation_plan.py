#!/usr/bin/env python
"""Compute the next DRIVER_WINDOW rotation from the committed
CORRECTNESS_r*.json history + the ROTATION.md risk-tier rule.

Usage:
    python tools/rotation_plan.py [next_round_number]

Mechanizes what rounds 8-12 did by hand (adopted round 13 so the
risk-tier selection is reproducible and judge-auditable):

1. HEAD — entries whose contract changed or that were registered since
   the last report (no verdict at all, or a changed oracle pairing):
   the protocol gives them a first verdict within one round.
2. RISK TIER (ROTATION.md rule of record) — entries whose Spark/oracle
   pair touches a known cross-engine numeric class (libm call, md5-
   seeded statistic, decimal(38,>=10) cast, dsum4/2^53 sum), detected
   from the operator + oracle SOURCE (inspect.getsource), due when the
   latest verdict is 3+ rounds old ("older than 3 rounds" at round N =
   latest <= N-4; a verdict at N-3 is exactly at cadence and due NEXT
   round). Oldest verdict first; name order breaks ties (there is no
   meaningful sub-round ordering in a driver report).
3. PLAIN QUEUE — everything else, oldest verdict first, name-ordered
   within a round, until the 50 slots fill.

The output is a PLAN for the human edit of catalog.DRIVER_WINDOW — the
tuple itself stays a reviewed literal (round-2 ADVICE), this tool just
removes the hand-computation of verdict ages and tier membership.
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import re
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

RISK_RE = (
    # libm calls whose last-ulp may differ across engines
    r"F\.(log|ln|exp|log2|log10|log1p|pow)\b|math\.(log|exp)|np\.(log|exp)"
    r"|\bln\(|\bexp\(|\blog\(",
    # md5-seeded deterministic statistics / samples
    r"F\.md5|md5\(",
    # wide decimal casts (scale-reduction class)
    r"decimal\(38,\s*1[0-9]|DECIMAL\(38,\s*1[0-9]",
    # 2^53 double-cast crossers (dsum2/dsum4 re-round fingerprints)
    r"2\*\*53|dsum4|DSUM4|dsum2|DSUM2",
    # cross-engine interpolation contracts (class #9, round 13)
    r"quantile_cont|percentile\(",
)


def risk_markers(fn, sql) -> list[str]:
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = ""
    src += "\n" + (sql or "")
    names = ("libm", "md5", "decimal", "dsum", "interp")
    return [n for n, pat in zip(names, RISK_RE) if re.search(pat, src)]


def main() -> int:
    from lenses_topology_example_spark import catalog

    next_round = int(sys.argv[1]) if len(sys.argv) > 1 else None
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        report = json.load(open(f))
        for k, v in report.items():
            latest[k] = rnd
            if not (v.get("rows_match") and v.get("err") is None):
                print(f"NOTE: {k} not clean in r{rnd} — holds in-window")
    if next_round is None:
        next_round = max(latest.values()) + 1

    cat = catalog._CATALOG
    head = [n for n in cat if n not in latest]
    risk, plain = [], []
    for n, (fn, sql) in cat.items():
        if n in head:
            continue
        m = risk_markers(fn, sql)
        (risk if m else plain).append((latest[n], n, m))
    due = sorted((a, n, m) for a, n, m in risk if a <= next_round - 4)
    plain_q = sorted((a, n) for a, n in [(a, n) for a, n, _ in plain])

    window, why = [], {}
    for n in head:
        window.append(n)
        why[n] = "head: no verdict yet (new or contract-changed)"
    for a, n, m in due:
        if len(window) >= 50:
            break
        window.append(n)
        why[n] = f"risk-tier [{','.join(m)}], latest r{a}"
    for a, n in plain_q:
        if len(window) >= 50:
            break
        if n in window:
            continue
        window.append(n)
        why[n] = f"plain queue, latest r{a}"

    print(f"# DRIVER_WINDOW plan for round {next_round}")
    print(f"# head={len(head)} risk-due={len(due)} (window cap 50)")
    for n in window:
        print(f'    "{n}",  # {why[n]}')
    overflow = [n for _, n, _ in due if n not in window]
    if overflow:
        print(f"# risk-tier overflow (due but out of slots): {overflow}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
