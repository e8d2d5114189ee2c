"""Normalized-line similarity sweep: every repo source file vs every
reference module.

Guards the project's no-transcription rule: for each (repo file,
reference file) pair it reports the longest run of consecutive
normalized lines that appear consecutively in both, plus the fraction
of the repo file's normalized lines that occur anywhere in the
reference file. Run it after touching any code with a reference
counterpart:

    python tools/copysweep.py               # report pairs over thresholds
    python tools/copysweep.py --all         # every pair's worst match

Normalization strips whitespace and drops blanks/comment-only lines, so
renamed-variable transcriptions still show up when statement structure
survives; schema/constant tables (dict keys, route names) legitimately
match and are judged by eye from the printed runs.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

RUN_THRESHOLD = 8       # consecutive identical normalized lines
FRACTION_THRESHOLD = 0.15


def normalized_lines(path: str) -> list[str]:
    try:
        with open(path, "r", encoding="utf-8", errors="replace") as handle:
            raw = handle.read()
    except OSError:
        return []
    out = []
    for line in raw.splitlines():
        line = re.sub(r"\s+", " ", line.strip())
        if not line or line.startswith("#"):
            continue
        out.append(line)
    return out


def longest_common_run(a: list[str], b: list[str]) -> tuple[int, int, int]:
    """(length, a_start, b_start) of the longest consecutive-line match."""
    positions: dict[str, list[int]] = {}
    for j, line in enumerate(b):
        positions.setdefault(line, []).append(j)
    best = (0, -1, -1)
    runs: dict[int, int] = {}  # b-index where a current run ends -> length
    for i, line in enumerate(a):
        next_runs: dict[int, int] = {}
        for j in positions.get(line, ()):
            length = runs.get(j - 1, 0) + 1
            next_runs[j] = length
            if length > best[0]:
                best = (length, i - length + 1, j - length + 1)
        runs = next_runs
    return best


def match_fraction(a: list[str], b: list[str]) -> float:
    if not a:
        return 0.0
    b_set = set(b)
    return sum(1 for line in a if line in b_set) / len(a)


def repo_sources() -> list[str]:
    roots = [os.path.join(REPO, "vrgdg_tpu"), os.path.join(REPO, "tools")]
    files = [os.path.join(REPO, "bench.py"),
             os.path.join(REPO, "__graft_entry__.py")]
    for root in roots:
        for base, _dirs, names in os.walk(root):
            if "_build" in base:
                continue
            files.extend(os.path.join(base, n) for n in names
                         if n.endswith((".py", ".cpp", ".h")))
    return sorted(f for f in files if os.path.isfile(f))


def reference_sources() -> list[str]:
    files = []
    for base, dirs, names in os.walk(REFERENCE):
        dirs[:] = [d for d in dirs if d not in (".git", "web", "Workflows")]
        files.extend(os.path.join(base, n) for n in names
                     if n.endswith(".py"))
    return sorted(files)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--all", action="store_true",
                        help="print every repo file's worst pair")
    parser.add_argument("--run", type=int, default=RUN_THRESHOLD)
    parser.add_argument("--fraction", type=float, default=FRACTION_THRESHOLD)
    args = parser.parse_args()

    ref_cache = {path: normalized_lines(path) for path in reference_sources()}
    flagged = 0
    for repo_path in repo_sources():
        a = normalized_lines(repo_path)
        if len(a) < 20:
            continue
        # Track the worst-run and worst-fraction pairs INDEPENDENTLY: a
        # long verbatim run can hide in a reference file with a lower
        # overall match fraction than some unrelated boilerplate-heavy
        # pair, and each criterion must see its own worst case.
        best_frac = (0.0, None)              # fraction, ref
        best_run = (0, None, -1, -1)         # run, ref, a_start, b_start
        for ref_path, b in ref_cache.items():
            if not b:
                continue
            frac = match_fraction(a, b)
            if frac > best_frac[0]:
                best_frac = (frac, ref_path)
            run, a_start, b_start = longest_common_run(a, b)
            if run > best_run[0]:
                best_run = (run, ref_path, a_start, b_start)
        frac, frac_ref = best_frac
        run, run_ref, a_start, b_start = best_run
        over = run >= args.run or frac >= args.fraction
        if args.all or over:
            rel = os.path.relpath(repo_path, REPO)
            run_rel = (os.path.relpath(run_ref, REFERENCE)
                       if run_ref else "-")
            frac_rel = (os.path.relpath(frac_ref, REFERENCE)
                        if frac_ref else "-")
            marker = " <-- OVER THRESHOLD" if over else ""
            print(f"{rel}: {frac:.1%} lines matched vs {frac_rel}, "
                  f"longest run {run} vs {run_rel} "
                  f"(repo line ~{a_start}, ref ~{b_start}){marker}")
            if over:
                flagged += 1
                for line in a[a_start:a_start + min(run, 12)]:
                    print(f"    | {line}")
    if flagged:
        print(f"\n{flagged} file(s) over thresholds "
              f"(run>={args.run} or fraction>={args.fraction:.0%})")
    else:
        print("clean: no file over thresholds")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
