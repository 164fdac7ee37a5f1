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
    DRIVER_WINDOW_SIZE,
    REGISTRY,
    _DRIVER_WINDOW_PRIORITY,
)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green_rows_from_previous_rounds() -> set[str]:
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and row.get("err") is None
            ):
                green.add(name)
    return green


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
