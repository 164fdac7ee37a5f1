"""Driver-window rotation invariants, made mechanical.

The driver's correctness harness checks queries() in registry order[:50]
(the window). The registry is larger than the window, so coverage is
rotational: every oracle-bearing query must either sit INSIDE this round's
window or carry a green hash row from a previous round's CORRECTNESS_r*.json
— otherwise a query could silently go driver-unchecked forever (this
happened to 28 entries in rounds 1-2). These tests pin both halves:

- the priority list is exactly the window size, duplicate-free, and is
  literally the registry's first 50 entries (the reorder ran);
- union(previous rounds' green rows, this round's window) covers every
  oracle-bearing registration.
"""

from __future__ import annotations

import glob
import json
import os

from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory import (
    CURRENT_ROUND,
    DRIVER_WINDOW_SIZE,
    REGISTRY,
    _DRIVER_WINDOW_PRIORITY,
)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _round_of(path: str) -> int:
    import re

    return int(re.search(r"CORRECTNESS_r(\d+)\.json", path).group(1))


def _correctness_rounds() -> list[tuple[int, dict]]:
    out = []
    for path in sorted(glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            out.append((_round_of(path), json.load(fh)))
    return out


def _green_rows_from_previous_rounds() -> set[str]:
    return set(_last_green_round())


def _last_green_round() -> dict[str, int]:
    """name -> most recent round whose CORRECTNESS artifact holds a full
    green hash row for it."""
    last: dict[str, int] = {}
    for rnd, data in _correctness_rounds():
        for name, row in data.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and row.get("err") is None
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def _rows_only_recorded_before(round_no: int) -> set[str]:
    """Names whose declared rows-only (err=no_oracle) driver row was
    recorded in a round BEFORE ``round_no`` — their weak check exists;
    re-windowing them would spend a slot on a row the driver can only
    ever mark `err`. Rows recorded by the CURRENT round's own window are
    exempt (that IS the one-time recording), so the suite stays green
    when the driver lands CORRECTNESS_r{CURRENT_ROUND}.json at round end."""
    rec: set[str] = set()
    for rnd, data in _correctness_rounds():
        if rnd >= round_no:
            continue
        for name, row in data.items():
            if row.get("err") == "no_oracle":
                rec.add(name)
    return rec


def test_window_names_are_registered():
    missing = [n for n in _DRIVER_WINDOW_PRIORITY if n not in REGISTRY]
    assert not missing, f"window names not in REGISTRY: {missing}"


def test_window_is_registry_prefix():
    # the reorder hook ran: registry insertion order starts with the window
    assert list(REGISTRY)[:DRIVER_WINDOW_SIZE] == _DRIVER_WINDOW_PRIORITY


def test_every_oracle_query_is_driver_covered():
    green = _green_rows_from_previous_rounds()
    window = set(_DRIVER_WINDOW_PRIORITY)
    uncovered = [
        name
        for name, q in REGISTRY.items()
        if q.oracle is not None and name not in window and name not in green
    ]
    assert not uncovered, (
        "oracle-bearing queries with NO driver coverage (not in this "
        f"round's window[:{DRIVER_WINDOW_SIZE}] and no green row in any "
        f"CORRECTNESS_r*.json): {uncovered} — rotate them into "
        "_DRIVER_WINDOW_PRIORITY"
    )


def test_no_recorded_rows_only_entry_in_window():
    """Once a rows-only (oracle=None) entry has its weak driver row
    recorded, it must rotate OUT: its slot can only ever produce an `err`
    row again, while an oracle-bearing query would produce a hash check
    (r4 verdict item 2)."""
    recorded = _rows_only_recorded_before(CURRENT_ROUND)
    stuck = [
        n
        for n in _DRIVER_WINDOW_PRIORITY
        if REGISTRY[n].oracle is None and n in recorded
    ]
    assert not stuck, (
        f"rows-only entries with a recorded driver row still in the "
        f"window: {stuck}"
    )


def test_no_oracle_entry_staler_than_three_rounds():
    """Staleness bound (r4 verdict item 8): every oracle-bearing entry is
    either in the CURRENT window (earning its green row this round) or
    carries a green row at most 3 rounds old — rotations must
    mechanically pick up the stalest entries."""
    last = _last_green_round()
    window = set(_DRIVER_WINDOW_PRIORITY)
    floor = CURRENT_ROUND - 3
    stale = [
        (n, last.get(n))
        for n, q in REGISTRY.items()
        if q.oracle is not None
        and n not in window
        and last.get(n, 0) < floor
    ]
    assert not stale, (
        f"oracle-bearing entries outside the window with last green row "
        f"older than round {floor}: {stale} — rotate them into "
        "_DRIVER_WINDOW_PRIORITY"
    )


def test_window_capacity_budget_for_future_rounds():
    """Saturation guard (r6 verdict item 2): 141+ oracle-bearing entries
    against a hard ceiling of DRIVER_WINDOW_SIZE x 3-round staleness mean
    rotation capacity must be planned, not discovered at verdict time.
    Model the steady state: assume every entry in THIS round's window
    earns its green row this round; then the cohort whose green rows
    expire at future round k (last green == k-4) must fit in round k's
    window, and the total oracle-bearing population must fit the
    window x staleness ceiling. A new oracle registration lands in the
    current window (other tests force that), which shifts cohort sizes —
    so this fails at REGISTRATION time when growth outruns capacity."""
    last = _last_green_round()
    window = set(_DRIVER_WINDOW_PRIORITY)
    oracle_names = [n for n, q in REGISTRY.items() if q.oracle is not None]

    ceiling = DRIVER_WINDOW_SIZE * 3
    assert len(oracle_names) <= ceiling, (
        f"{len(oracle_names)} oracle-bearing queries exceed the rotation "
        f"ceiling {DRIVER_WINDOW_SIZE} slots x 3-round staleness = {ceiling}; "
        "stop registering oracle queries or raise the window size"
    )

    def effective_green(name: str) -> int:
        return CURRENT_ROUND if name in window else last.get(name, 0)

    for k in range(CURRENT_ROUND + 1, CURRENT_ROUND + 4):
        must_rewindow = [n for n in oracle_names if effective_green(n) == k - 4]
        assert len(must_rewindow) <= DRIVER_WINDOW_SIZE, (
            f"round {k} would need {len(must_rewindow)} re-verification "
            f"slots but the window holds {DRIVER_WINDOW_SIZE}: stagger some "
            f"of this cohort into an earlier round's spare slots now"
        )


def test_registered_callables_have_driver_signature():
    """Every registry entry must be a (spark, sf_dir) callable — a
    decorator landing on the wrong function (e.g. a helper inserted
    between @register and its query during a refactor, which silently
    registered a (docs, n) edge builder in round 7) fails here instead
    of at driver time."""
    import inspect

    bad = [
        (name, list(inspect.signature(q.spark_fn).parameters))
        for name, q in REGISTRY.items()
        if list(inspect.signature(q.spark_fn).parameters)[:2]
        != ["spark", "sf_dir"]
    ]
    assert not bad, f"registered callables with non-driver signatures: {bad}"
