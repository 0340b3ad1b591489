#!/usr/bin/env python
"""Compute the next DRIVER_WINDOW rotation from the committed
CORRECTNESS_r*.json history + the ROTATION.md risk-tier rule.

Usage:
    python tools/rotation_plan.py [next_round_number]

Mechanizes what rounds 8-12 did by hand (adopted round 13 so the
risk-tier selection is reproducible and judge-auditable):

1. HEAD — entries the protocol owes a fresh verdict within one round:
   (a) registered since the last report (no verdict at all),
   (b) CONTRACT-CHANGED since the last window write — detected by
       comparing a fingerprint of each entry's (oracle SQL + builder
       source, comments stripped) against the committed snapshot in
       tools/contract_fingerprints.json (refresh it with
       `--update-fingerprints` when writing the new window; the r13
       ADVICE fix — before this the tool could not see the documented
       "changed oracle pairing / plan rewrite re-enters the head" rule
       and would have mis-slotted e.g. the r13 trio), and
   (c) RED in their LATEST verdict (rows/schema/err or a hash_match
       false) — held in-window, not merely NOTEd (same ADVICE fix).
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


FINGERPRINT_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "contract_fingerprints.json"
)


def _source_sans_comments(src: str) -> str:
    """Drop COMMENT tokens only, via the tokenizer — never by text
    splitting on '#' (r14 ADVICE: the old ln.split('#') also truncated
    code at a '#' INSIDE string literals, e.g. F.concat_ws("#", ...),
    so a contract edit after the '#' on such a line left the
    fingerprint unchanged and head detection silently missed it). On a
    tokenize failure, keep the source verbatim — comments churning the
    hash is a false re-head (harmless); truncated code is a miss."""
    import io
    import tokenize

    try:
        toks = [
            t
            for t in tokenize.generate_tokens(io.StringIO(src).readline)
            if t.type != tokenize.COMMENT
        ]
        return tokenize.untokenize(toks)
    except (tokenize.TokenError, IndentationError, SyntaxError, ValueError):
        # ValueError: untokenize raises it on irregular token streams
        # (r15 ADVICE) — same fail-open contract as the parse errors.
        return src


def contract_fingerprint(fn, sql) -> str:
    """Stable hash of an entry's CONTRACT surface: the oracle SQL plus
    the builder source with comment tokens stripped and whitespace
    collapsed (so pure comment/format churn doesn't re-head an entry,
    while docstring/plan/oracle edits — the things the rotation rule
    calls a contract change — do).

    ALGORITHM CHANGE (round 15) invalidates all recorded fingerprints:
    the r15 head set was computed with the OLD algorithm against the
    r14 snapshot BEFORE this fix landed, then the snapshot was
    refreshed with the new algorithm at window-write time (ROTATION.md
    round-15 note)."""
    import hashlib
    import textwrap

    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        src = ""
    lines = [
        re.sub(r"\s+", " ", ln).strip()
        for ln in _source_sans_comments(textwrap.dedent(src)).splitlines()
    ]
    norm = "\n".join(ln for ln in lines if ln)
    body = norm + "\n---\n" + re.sub(r"\s+", " ", sql or "").strip()
    return hashlib.sha256(body.encode()).hexdigest()[:16]


def is_clean(v: dict) -> bool:
    """A verdict row is clean iff rows+schema match, no error, and
    hash_match is not an explicit false (absent/None = rows-only or
    property-paired without a hash — clean)."""
    return bool(
        v.get("rows_match")
        and v.get("schema_match", True)
        and v.get("err") is None
        and v.get("hash_match") is not False
    )


def main() -> int:
    from lenses_topology_example_spark import catalog

    pos_args = [a for a in sys.argv[1:] if not a.startswith("--")]
    update_fp = "--update-fingerprints" in sys.argv[1:]
    next_round = int(pos_args[0]) if pos_args else None
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    latest_clean: dict[str, bool] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        report = json.load(open(f))
        for k, v in report.items():
            latest[k] = rnd
            latest_clean[k] = is_clean(v)
    if next_round is None:
        next_round = max(latest.values()) + 1

    cat = catalog._CATALOG
    fps = {n: contract_fingerprint(fn, sql) for n, (fn, sql) in cat.items()}
    try:
        recorded = json.load(open(FINGERPRINT_FILE))
    except FileNotFoundError:
        recorded = {}
        print(
            "WARNING: no contract_fingerprints.json — contract-change "
            "head detection inactive this run (write one with "
            "--update-fingerprints)"
        )
    changed = {
        n for n in cat if n in recorded and recorded[n] != fps[n]
    }
    head, head_why = [], {}
    for n in cat:
        if n not in latest:
            head.append(n)
            head_why[n] = "head: no verdict yet (new registration)"
        elif n in changed:
            head.append(n)
            head_why[n] = "head: contract changed since last window write"
        elif not latest_clean[n]:
            head.append(n)
            head_why[n] = f"head: RED latest verdict (r{latest[n]}) — held in-window"
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
        why[n] = head_why[n]
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
    if update_fp:
        json.dump(fps, open(FINGERPRINT_FILE, "w"), indent=1, sort_keys=True)
        print(f"# wrote {len(fps)} fingerprints -> {FINGERPRINT_FILE}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
