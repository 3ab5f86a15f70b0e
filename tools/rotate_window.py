"""Driver-verification window planner: the correctness driver checks only
the FIRST 50 entries of queries(), so registration order is a rotating
window (README.md "Driver-verification history"). This tool reads every
CORRECTNESS_r*.json plus the current registration order and prints

  - per-query verification history (which rounds produced a green row),
  - a suggested next-round ordering: never-green first, then by oldest
    last-green round, ties broken by fewest total greens (so coverage
    debt drains fastest), veterans in the tail,
  - the regenerated README table body (--table).

Pure file parsing — no Spark session. Usage:

    python tools/rotate_window.py            # history + suggested order
    python tools/rotate_window.py --table    # README table body
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def registration_order() -> list[str]:
    src = open(os.path.join(REPO, "__spark_entry__.py")).read()
    body = re.search(r"def queries\(\).*?return \{(.*?)\n    \}", src, re.S)
    return re.findall(r'"([a-z0-9_]+)": q_[a-z0-9_]+,', body.group(1))


def history() -> dict[str, dict[int, str]]:
    hist: dict[str, dict[int, str]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r0*(\d+)", path).group(1))
        for name, row in json.load(open(path)).items():
            if not isinstance(row, dict):
                continue
            status = (
                "err" if row.get("err")
                else "green" if row.get("hash_match")
                else "rows" if row.get("rows_match")
                else "mismatch"
            )
            hist.setdefault(name, {})[rnd] = status
    return hist


def suggest(names: list[str], hist: dict[str, dict[int, str]]) -> list[str]:
    def key(n: str):
        greens = [r for r, s in hist.get(n, {}).items() if s == "green"]
        last = max(greens) if greens else -1  # never-green sorts first
        return (last, len(greens), names.index(n))

    return sorted(names, key=key)


def main() -> None:
    names = registration_order()
    hist = history()
    rounds = sorted({r for h in hist.values() for r in h})
    if "--table" in sys.argv:
        cols = " | ".join(f"r{r}" for r in rounds)
        print(f"| # | query | {cols} | next window |")
        print("|---" * (len(rounds) + 3) + "|")
        order = suggest(names, hist)
        for i, n in enumerate(order, 1):
            cells = " | ".join(
                {"green": "✓"}.get(hist.get(n, {}).get(r, "-"),
                                    hist.get(n, {}).get(r, "-"))
                for r in rounds
            )
            print(f"| {i} | `{n}` | {cells} | {'yes' if i <= WINDOW else 'no'} |")
        return

    order = suggest(names, hist)
    never = [n for n in names if not any(
        s == "green" for s in hist.get(n, {}).values())]
    print(f"{len(names)} registered; window={WINDOW}; "
          f"never-green: {len(never)} {never}")
    print("\nsuggested next-round order (paste into queries()):")
    for i, n in enumerate(order, 1):
        greens = sorted(r for r, s in hist.get(n, {}).items() if s == "green")
        mark = "  <-- window edge" if i == WINDOW else ""
        print(f"  {i:3d}. {n:28s} greens={greens}{mark}")


if __name__ == "__main__":
    main()
