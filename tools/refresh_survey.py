#!/usr/bin/env python
"""Regenerate (or verify) SURVEY.md §8's registry-status table from the
CORRECTNESS artifacts — the mechanical form of the judge's per-round
"diff the table against the artifacts" audit, so the table cannot rot.

    python tools/refresh_survey.py           # rewrite the table in place
    python tools/refresh_survey.py --check   # exit 1 on any discrepancy

--check has TWO green states. The driver writes CORRECTNESS_r{N}.json
AFTER the round's last commit, so at every round's HEAD the committed
table is legitimately one artifact behind; the check distinguishes that
from real drift: if the committed table equals the derivation with the
newest artifact EXCLUDED (i.e. the only difference at HEAD is exactly
that artifact's recorded rows moving forward), it reports
PENDING-REFRESH and exits 0. Any other discrepancy — a stale note, a
wrong Ext cell, a window mismatch — still diffs and exits 1.

Ext column = newest round whose CORRECTNESS_r0N.json row is fully green
(rows+schema+hash); queries with no external row yet render "sim only".
Changed-column notes are free text maintained IN the table — the tool
preserves them by name, so regeneration never loses an annotation. The
window column is derived from _NEEDS_FRESH_EVIDENCE (the first 50
registry names). The window column header (e.g. "r7-50") names the round
being recorded; pass --round N to advance it.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SURVEY = os.path.join(HERE, "SURVEY.md")


def newest_evidence(exclude_round: int | None = None) -> dict[str, int]:
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        rno = int(m.group(1))
        if rno == exclude_round:
            continue
        for name, row in json.load(open(path)).items():
            if row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                newest[name] = max(rno, newest.get(name, 0))
    return newest


def latest_artifact_round() -> int | None:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(p)))
    ]
    return max(rounds) if rounds else None


def parse_existing(surv: str) -> tuple[str, dict[str, str], int, int]:
    """Return (window header tag like 'r7-50', name->changed-note map,
    table start offset, table end offset)."""
    m = re.search(r"\| Registry query \| Ext \| Changed \| (r\d+-50) \|", surv)
    if not m:
        raise SystemExit("SURVEY.md §8 table header not found")
    tag = m.group(1)
    start = m.start()
    sentinel = "\nMapping of declared IDs -> registry names:"
    try:
        end = surv.index(sentinel, start)
    except ValueError:
        raise SystemExit(
            f"SURVEY.md §8 end sentinel not found after the table header: "
            f"{sentinel.strip()!r}"
        ) from None
    changed: dict[str, str] = {}
    for line in surv[start:end].splitlines():
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) == 8:
            for off in (0, 4):
                if cells[off].startswith("q_") and cells[off + 2]:
                    changed[cells[off]] = cells[off + 2]
        elif any(c.startswith("q_") for c in cells):
            # a note containing a literal '|' would mis-split the row and
            # silently drop the annotation on regeneration — refuse
            raise SystemExit(
                f"§8 row does not split into 8 cells (embedded '|'? ): {line!r}"
            )
    return tag, changed, start, end


def render(tag: str, changed: dict[str, str], exclude_round: int | None = None) -> str:
    from hadoop_0_20_2_ljx_spark.queries import REGISTRY, _NEEDS_FRESH_EVIDENCE

    orphans = sorted(set(changed) - set(REGISTRY))
    if orphans:
        # a renamed registry query would otherwise silently drop its
        # Changed-column annotation on regeneration
        raise SystemExit(
            f"§8 Changed-column notes reference names absent from the "
            f"registry (renamed query?): {orphans}"
        )
    newest = newest_evidence(exclude_round)
    win = set(_NEEDS_FRESH_EVIDENCE)
    rows = [
        (
            n,
            f"r{newest[n]}" if n in newest else "sim only",
            changed.get(n, ""),
            "yes" if n in win else "",
        )
        for n in REGISTRY
    ]
    half = (len(rows) + 1) // 2
    out = [
        f"| Registry query | Ext | Changed | {tag} | Registry query | Ext | Changed | {tag} |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for i in range(half):
        left = rows[i]
        right = rows[half + i] if half + i < len(rows) else ("", "", "", "")
        out.append("| " + " | ".join(left) + " | " + " | ".join(right) + " |")
    return "\n".join(out) + "\n"


def main() -> int:
    check = "--check" in sys.argv
    rnd = None
    if "--round" in sys.argv:
        try:
            rnd = int(sys.argv[sys.argv.index("--round") + 1])
        except (IndexError, ValueError):
            raise SystemExit("--round needs an integer argument") from None
    surv = open(SURVEY).read()
    tag, changed, start, end = parse_existing(surv)
    if rnd is not None:
        tag = f"r{rnd}-50"
    table = render(tag, changed)
    current = surv[start:end]
    if check:
        if current.rstrip("\n") + "\n" == table:
            print("SURVEY §8 table matches the artifacts")
            return 0
        # Second green state: the committed table equals the derivation
        # with the newest artifact excluded — the artifact merely
        # postdates the last commit (the driver writes it after the
        # round's final commit), so the pending diff is exactly that
        # artifact's recorded rows and nothing else. Not drift.
        latest = latest_artifact_round()
        if latest is not None and current.rstrip("\n") + "\n" == render(
            tag, changed, exclude_round=latest
        ):
            print(
                f"SURVEY §8 PENDING-REFRESH: table is green at the pre-"
                f"CORRECTNESS_r{latest:02d} state; the only diff is that "
                f"artifact's rows. Run `python tools/refresh_survey.py` "
                f"to fold it in."
            )
            return 0
        import difflib

        for line in difflib.unified_diff(
            current.splitlines(), table.splitlines(), "committed", "derived", lineterm=""
        ):
            print(line)
        return 1
    open(SURVEY, "w").write(surv[:start] + table + surv[end:])
    print(f"SURVEY §8 table rewritten ({tag})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
