"""SCD Type 2 history from a CDC change stream.

The reference keeps only latest state: its stored procedures delete the
previous row for every staged key (sql/incremental_sync_members.sql:42-47),
so a member rename erases the old name. This operator is the beyond-reference
extension a warehouse team asks for next: keep EVERY version as a validity
interval — ``valid_from`` / ``valid_to`` / ``is_current`` — so point-in-time
queries ("what was this member called on March 3?") become a simple
``valid_from <= t AND (valid_to IS NULL OR t < valid_to)`` filter.

Semantics (delete+insert CDC, same event vocabulary as operators/merge.py):

- every INSERT/MODIFY change opens a version at its event time;
- a version closes when the NEXT change for the same key arrives
  (``valid_to`` = that change's event time; half-open intervals, so
  consecutive versions tile the timeline with no gap or overlap);
- a REMOVE closes the previous version and opens nothing — a fully
  removed key has no current row;
- ``is_current`` = the version is open (``valid_to IS NULL``).

Spark-first scale posture: ONE window (lead) over the change set keyed by
the entity key — one shuffle, skew-free for uuid keys, no join against the
existing history. At 100 TB the change stream is appended partition-wise and
the history table is rebuilt incrementally per micro-batch by restricting
``df`` to staged keys (broadcast semi-join), exactly like operators/merge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tie_cols: Sequence[str] = (),
    event_col: str | None = None,
    remove_value: str = "REMOVE",
) -> DataFrame:
    """Turn a change stream into Type-2 history rows.

    ``df``: one row per change event, carrying the key, the event
    timestamp, the attribute columns, and (optionally) ``event_col``
    distinguishing REMOVE tombstones from upserts.

    ``tie_cols`` break same-timestamp ties deterministically (e.g. the
    Kinesis sequence number / event id) — without one, ``lead`` over equal
    timestamps is nondeterministic and replays would produce different
    histories.

    Returns ``df``'s columns (minus ``event_col``) plus ``valid_from``
    (timestamp), ``valid_to`` (timestamp, NULL while open) and
    ``is_current`` (int 0/1 — int, not boolean, so downstream exports and
    cross-engine checks canonicalize identically).
    """
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in tie_cols]
    )
    out = (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn(
            "is_current", F.col("valid_to").isNull().cast("int")
        )
    )
    if event_col is not None:
        # The lead() above already consumed the tombstone's timestamp into
        # the previous version's valid_to; the tombstone itself emits no row.
        out = out.filter(F.col(event_col) != F.lit(remove_value)).drop(event_col)
    return out


def as_of(history: DataFrame, ts, ts_col_from: str = "valid_from",
          ts_col_to: str = "valid_to") -> DataFrame:
    """Point-in-time snapshot of an SCD2 history table.

    Half-open interval filter — both predicates push down to the scan, and
    on a history table partitioned by date(valid_from) the first one prunes
    partitions.
    """
    t = F.lit(ts)
    return history.filter(
        (F.col(ts_col_from) <= t)
        & (F.col(ts_col_to).isNull() | (t < F.col(ts_col_to)))
    )
