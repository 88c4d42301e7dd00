"""Round-13 fuzz: the water-filling mixture solver's closed form vs an
iterative simulator.

`sampling.mixture_waterfill` computes the capped set with a single
prefix scan in capacity-ratio order (the SQL-expressible closed form).
The textbook algorithm is iterative: flood all domains below the
current water level, recompute the level from the remaining budget and
weight, repeat until stable. This fuzz replays the closed form in pure
Python (shared arithmetic, not shared code with the Spark/SQL plans)
against the iterative fixpoint over random instances, checking the
capped set and every integer draw. Non-circular on the fixpoint: the
simulator never sorts and never uses prefix sums."""

import random

import pytest


def _closed_form(items, budget):
    """The scan the Spark/DuckDB plans implement: sort by c/w, find the
    first row whose cap survives the water level implied by capping
    everything before it, flag by cross-multiplication."""
    order = sorted(
        range(len(items)),
        key=lambda i: (items[i][1] / items[i][0], i),
    )
    p = sum(w for w, _ in items)
    a_before = w_before = 0
    rem_b, rem_w = 1, 0  # no-survivor default: everything caps
    for i in order:
        w, c = items[i]
        if c * (p - w_before) >= w * (budget - a_before):
            rem_b, rem_w = budget - a_before, p - w_before
            break
        a_before += c
        w_before += w
    draws = {}
    for i, (w, c) in enumerate(items):
        capped = c * rem_w < w * rem_b
        draws[i] = c if capped else (w * rem_b) // rem_w
    return draws


def _iterative(items, budget):
    """Flood-and-recompute fixpoint; no sorting, no prefix sums."""
    capped = set()
    while True:
        rem_w = sum(w for i, (w, _) in enumerate(items) if i not in capped)
        rem_b = budget - sum(items[i][1] for i in capped)
        if rem_w == 0:
            break
        newly = {
            i for i, (w, c) in enumerate(items)
            if i not in capped and c * rem_w < w * rem_b
        }
        if not newly:
            break
        capped |= newly
    return {
        i: c if i in capped or rem_w == 0 else (w * rem_b) // rem_w
        for i, (w, c) in enumerate(items)
    }


@pytest.mark.parametrize("seed", range(40))
def test_waterfill_closed_form_matches_iterative(seed):
    rng = random.Random(seed)
    n = rng.randint(1, 12)
    items = [
        (rng.randint(1, 9), rng.randint(1, 5000)) for _ in range(n)
    ]
    total_cap = sum(c for _, c in items)
    budget = rng.randint(1, max(2, int(total_cap * 1.5)))
    assert _closed_form(items, budget) == _iterative(items, budget), (
        f"seed={seed} items={items} budget={budget}"
    )


def test_waterfill_budget_exceeds_capacity():
    items = [(1, 10), (3, 20)]
    draws = _closed_form(items, 1000)
    assert draws == {0: 10, 1: 20}
    assert draws == _iterative(items, 1000)


def test_waterfill_no_caps():
    items = [(1, 1000), (1, 1000)]
    draws = _closed_form(items, 10)
    assert draws == {0: 5, 1: 5}
    assert draws == _iterative(items, 10)
