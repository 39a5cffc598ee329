"""Refresh the stale-first driver-verification rotation from the newest
CORRECTNESS_r{N}.json — automates the maintenance contract documented on
_DRIVER_GREEN_ROUND (yamon_spark/queries/__init__.py):

  1. bump the round of every re-hashed green entry;
  2. REMOVE entries that errored or hash-mismatched (they re-verify as
     fresh);
  3. never add a query the driver did not hash-verify.

Run at the start of each round (after the driver drops the new
CORRECTNESS file):   python scripts/refresh_green.py [--write]

Without --write it prints the diff it would apply; with --write it
rewrites the literal dict in queries/__init__.py between the
_DRIVER_GREEN_ROUND markers, grouped by round vintage.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INIT = os.path.join(REPO, "yamon_spark", "queries", "__init__.py")


def latest_correctness() -> tuple[int, dict]:
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not files:
        raise SystemExit("no CORRECTNESS_r*.json found")
    path = files[-1]
    rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
    with open(path) as f:
        return rnd, json.load(f)


def current_map() -> dict[str, int]:
    from yamon_spark.queries import _DRIVER_GREEN_ROUND

    return dict(_DRIVER_GREEN_ROUND)


def refreshed_map() -> tuple[dict[str, int], list[str], list[str], list[str]]:
    rnd, rows = latest_correctness()
    cur = current_map()
    out = dict(cur)
    bumped, removed, added = [], [], []
    for name, row in rows.items():
        green = bool(row.get("hash_match")) and not row.get("err")
        if green:
            if cur.get(name) != rnd:
                (bumped if name in cur else added).append(name)
            out[name] = rnd
        elif name in out:
            removed.append(name)
            del out[name]
    return out, bumped, removed, added


def render(m: dict[str, int]) -> str:
    by_round: dict[int, list[str]] = {}
    for name, rnd in m.items():
        by_round.setdefault(rnd, []).append(name)
    lines = ["_DRIVER_GREEN_ROUND: dict[str, int] = {"]
    for rnd in sorted(by_round):
        pos = "oldest — front of the verified segment" if rnd == min(by_round) else (
            "freshest — back of the queue" if rnd == max(by_round) else ""
        )
        suffix = f" ({pos})" if pos else ""
        lines.append(f"    # r{rnd}-vintage{suffix}")
        row: list[str] = []
        for name in sorted(by_round[rnd]):
            item = f'"{name}": {rnd},'
            if sum(len(x) + 1 for x in row) + len(item) > 72:
                lines.append("    " + " ".join(row))
                row = []
            row.append(item)
        if row:
            lines.append("    " + " ".join(row))
    lines.append("}")
    return "\n".join(lines)


def main() -> None:
    write = "--write" in sys.argv
    new_map, bumped, removed, added = refreshed_map()
    print(f"bumped: {len(bumped)} {sorted(bumped)[:6]}{'...' if len(bumped) > 6 else ''}")
    print(f"added:  {len(added)} {sorted(added)[:6]}{'...' if len(added) > 6 else ''}")
    print(f"removed (regressed -> re-verify as fresh): {removed}")
    if not write:
        print("\n(dry run — pass --write to rewrite queries/__init__.py)")
        return
    src = open(INIT).read()
    pat = re.compile(r"_DRIVER_GREEN_ROUND: dict\[str, int\] = \{.*?\n\}", re.S)
    if not pat.search(src):
        raise SystemExit("marker dict not found in queries/__init__.py")
    open(INIT, "w").write(pat.sub(lambda _: render(new_map), src, count=1))
    print(f"rewrote {INIT} with {len(new_map)} entries")


if __name__ == "__main__":
    main()
