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
    """Everything past the window must have a green row in the latest
    recorded round, so union(latest, this round) keeps every row <= 1
    round old."""
    rnd, green = _latest_correctness()
    names = list(QUERIES)
    for name in names[GATE_WINDOW:]:
        assert GATE_LAST_GREEN[name] == rnd, (
            f"{name} outside the window with last green r"
            f"{GATE_LAST_GREEN[name]} (latest recorded round is r{rnd})"
        )
        # the recorded value matches the actual CORRECTNESS file, except
        # for folded/renamed entries which must then be IN the window
        assert name in green, (
            f"{name} outside the window but absent from CORRECTNESS_r{rnd}"
        )


def test_window_ordering_is_least_recently_gated_first():
    names = list(QUERIES)
    rounds = [GATE_LAST_GREEN[n] for n in names]
    assert rounds == sorted(rounds)
