"""Driver-gate rotation policy (VERDICT r4 ask #1), enforced structurally:
the driver checks only the first GATE_WINDOW entries of QUERIES per round,
so every entry that would otherwise go stale beyond one round MUST sort
into the window, and everything outside the window must carry a green row
from the immediately previous round. No Spark needed — pure registry
checks against the repo's CORRECTNESS history."""

from __future__ import annotations

import json
from pathlib import Path

from search_engine_spark.entry_queries import (
    GATE_LAST_GREEN,
    GATE_WINDOW,
    ORACLES,
    QUERIES,
)

REPO = Path(__file__).resolve().parents[1]


def _latest_correctness() -> tuple[int, set[str]]:
    files = sorted(REPO.glob("CORRECTNESS_r*.json"))
    assert files, "no CORRECTNESS history in repo"
    latest = files[-1]
    rnd = int(latest.stem.split("_r")[1])
    return rnd, set(json.load(open(latest)))


def test_every_entry_has_an_oracle():
    assert set(QUERIES) == set(ORACLES)


def test_registry_and_history_agree():
    # GATE_LAST_GREEN covers exactly the registry (a typo'd key would
    # silently sort an entry as never-gated — or worse, drop its rotation)
    assert set(GATE_LAST_GREEN) == set(QUERIES)


def test_stale_entries_sort_into_the_window():
    """Entries whose last green row is older than the previous round (or
    0 = new/changed) must be among the first GATE_WINDOW names."""
    prev_round = max(GATE_LAST_GREEN.values())
    names = list(QUERIES)
    window = set(names[:GATE_WINDOW])
    for name in names:
        last = GATE_LAST_GREEN[name]
        if last < prev_round:
            assert name in window, (
                f"{name} last gated r{last} but sorted outside the "
                f"{GATE_WINDOW}-entry window — would go >1 round stale"
            )


def test_out_of_window_entries_are_fresh():
    """Everything past the window must be ≤1 round stale: its recorded
    last-green round is at most one behind the newest CORRECTNESS file,
    and that round's file really does carry its green row (so the union
    of the last two rounds covers the whole registry)."""
    latest_rnd, _ = _latest_correctness()
    names = list(QUERIES)
    for name in names[GATE_WINDOW:]:
        last = GATE_LAST_GREEN[name]
        assert last >= latest_rnd - 1, (
            f"{name} outside the window with last green r{last} "
            f"(newest recorded round is r{latest_rnd}) — >1 round stale"
        )
        recorded = REPO / f"CORRECTNESS_r{last:02d}.json"
        assert recorded.exists(), f"missing {recorded.name}"
        row = json.load(open(recorded)).get(name)
        assert row is not None, (
            f"{name} outside the window but absent from {recorded.name}"
        )


def test_window_ordering_is_least_recently_gated_first():
    names = list(QUERIES)
    rounds = [GATE_LAST_GREEN[n] for n in names]
    assert rounds == sorted(rounds)
