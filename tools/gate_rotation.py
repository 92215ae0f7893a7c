"""Refresh GATE_LAST_GREEN from the repo's CORRECTNESS_r*.json history.

Run after a round's correctness report lands:

    python tools/gate_rotation.py

Prints (a) the up-to-date GATE_LAST_GREEN literal to paste into
search_engine_spark/entry_queries.py, (b) which entries will sit inside
the next round's GATE_WINDOW under that table, and (c) loud warnings for
any entry that would go stale beyond one round anyway (window too small
for the backlog) — the structural guarantee tests/test_gate_rotation.py
then enforces. Entries you changed this round should be reset to 0 by
hand (the tool cannot know the diff); everything else is mechanical.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from search_engine_spark.entry_queries import (  # noqa: E402
    GATE_LAST_GREEN,
    GATE_WINDOW,
    QUERIES,
)


def main() -> int:
    history: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(f.stem.split("_r")[1])
        report = json.load(open(f))
        for name, row in report.items():
            ok = (
                row.get("hash_match")
                or (row.get("rows_match") and row.get("err") is None
                    and "hash_match" not in row)
            )
            if ok and name in QUERIES:
                history[name] = max(history.get(name, 0), rnd)

    table = {name: history.get(name, 0) for name in QUERIES}
    # preserve deliberate by-hand resets to 0 (changed code paths): a
    # reset stands until a green row NEWER than every round the current
    # table records proves the changed code re-gated — any green at or
    # before the table's max round predates the change (it gated the
    # pre-change code) and must not revive the entry past the window
    reset_cleared_after = max(GATE_LAST_GREEN.values(), default=0)
    for name, rnd in GATE_LAST_GREEN.items():
        if (
            name in table
            and rnd == 0
            and history.get(name, 0) <= reset_cleared_after
        ):
            table[name] = 0

    order = {n: i for i, n in enumerate(QUERIES)}
    ranked = sorted(table, key=lambda n: (table[n], order[n]))
    window = ranked[:GATE_WINDOW]

    print("GATE_LAST_GREEN = {")
    for name in ranked:
        print(f'    "{name}": {table[name]},')
    print("}")
    print(f"\n# next-round window ({len(window)}/{len(ranked)}):")
    for name in window:
        print(f"#   {name} (last green r{table[name]})")
    latest = max(table.values())
    stale = [
        n for n in ranked[GATE_WINDOW:] if table[n] < latest
    ]
    if stale:
        print(f"\n# WARNING: stale beyond one round even after rotation: "
              f"{stale}")
        return 1
    print("\n# rotation healthy: every out-of-window entry is "
          f"green in r{latest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
