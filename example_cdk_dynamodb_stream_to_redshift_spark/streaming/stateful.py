"""Custom stateful streaming operator: per-key running aggregates via
``applyInPandasWithState``.

This is the escape hatch for stateful semantics the built-in windowed
aggregations can't express (running totals that never window out,
custom eviction policies, per-key state machines). Mechanics:

- state is partitioned by the grouping key and lives in the state store
  (RocksDB/HDFS-backed on a cluster), NOT in executor heap: per-key size is
  what matters, key cardinality scales out with partitions;
- each micro-batch hands the operator only that batch's rows for keys that
  changed, plus their state handle — cost ∝ batch, not history;
- the Python boundary is Arrow-batched (Pandas per group-batch), the one
  place a Python UDF is justified (SURVEY.md §2.9 / pyspark guide).

The reference has no such operator; this generalizes its CDC running-state
idea (current value per key, ST2-ST4) beyond delete+insert semantics.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n_events bigint, total_value double"


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming per-user lifetime event count + value total. Emits the
    updated running totals for every user seen in each micro-batch.

    The state function is a NESTED def: cloudpickle serializes it by
    value, whereas a module-level function pickles as a reference the
    Python workers must re-import — workers don't share the driver's
    sys.path, so that breaks whenever the driver runs outside the repo
    root (same hardening as simhash64 / the multimodal kernels)."""

    def update_user_stats(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
