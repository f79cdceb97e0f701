"""Round-start status report: what the next verification window will
re-check and whether the tree already contains post-verdict work.

Prints, without modifying anything:
  1. the VERDICT.md snapshot sha vs HEAD (post-verdict commits, if any);
  2. the certification-ledger round distribution;
  3. the driver's 50-slot window in export order, split into
     never-verified / wrapper-rewritten / dep-evicted / certified-
     refresh tiers (the same tiering `plans/registry._ordered()` uses).

Run AFTER tools/regen_certified.py has folded the latest
CORRECTNESS_r{N}.json into plans/certified.py — the report reflects the
ledger on disk. Typical round-start sequence:

    python tools/regen_certified.py r1=<sha> ... rN=<sha>
    python tools/round_report.py
"""

from __future__ import annotations

import pathlib
import re
import subprocess
import sys
from collections import Counter

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from unilever_scraping_etl_spark.plans import certified, registry

    verdict = (REPO / "VERDICT.md")
    snap = None
    if verdict.exists():
        m = re.search(r"git history through [`']?([0-9a-f]{7,40})",
                      verdict.read_text())
        snap = m.group(1) if m else None
    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          cwd=REPO, capture_output=True,
                          text=True).stdout.strip()
    print(f"HEAD: {head}   VERDICT snapshot: {snap or '(none found)'}")
    if snap:
        between = subprocess.run(
            ["git", "log", "--oneline", f"{snap}..HEAD"],
            cwd=REPO, capture_output=True, text=True).stdout.splitlines()
        # the driver's own artifact commit lands right after the snapshot;
        # a subject-less oneline (empty commit message) has no second part
        work = [l for l in between
                if not (len(p := l.split(" ", 1)) > 1
                        and p[1].startswith("round "))]
        print(f"post-verdict commits: {len(work)}"
              + (" — check them against VERDICT/ADVICE before redoing "
                 "items" if work else " (fresh round)"))

    rounds = Counter(r for r, _ in certified.CERTIFIED.values())
    print(f"ledger: {sum(rounds.values())} certified "
          f"{dict(sorted(rounds.items()))}; "
          f"EVER_GREEN {len(certified.EVER_GREEN)}")

    names = list(registry._ordered())
    ever = set(certified.EVER_GREEN)
    cert = {n for n in registry.QUERIES
            if registry._cert_round(n) is not None}
    win = names[:50]
    never = [n for n in win if n not in ever]
    rewritten, evicted, refresh = [], [], []
    for n in win:
        if n in never:
            continue
        if n in cert:
            refresh.append(n)
        elif (certified.LAST_GREEN_WRAPPER_FP.get(n)
              != registry._wrapper_fp(registry.QUERIES[n])):
            rewritten.append(n)
        else:
            evicted.append(n)
    print(f"\nwindow (50 of {len(names)} in export order):")
    for label, tier in (("never-verified", never),
                        ("wrapper-rewritten", rewritten),
                        ("dep-evicted", evicted),
                        ("certified-refresh", refresh)):
        print(f"  {label} ({len(tier)}): {', '.join(tier) or '—'}")
    outside = [n for n in names[50:] if n not in cert]
    if outside:
        print(f"\nUNVERIFIED OUTSIDE THE WINDOW ({len(outside)}): "
              f"{', '.join(outside)} — these get NO driver check this "
              "round; shrink the head tiers if any matter.")


if __name__ == "__main__":
    main()
