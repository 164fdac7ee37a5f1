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


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """``running_user_stats`` on the transformWithStateInPandas API
    (Spark 4's arbitrary-stateful-processing surface, the successor to
    applyInPandasWithState): a StatefulProcessor with a typed ValueState
    per user. Same semantics — lifetime event count + value total,
    updated rows emitted per touched user per micro-batch — proven
    equal to the applyInPandasWithState form AND to the batch ground
    truth in tests/test_stateful_streaming.py.

    What the new API adds over the old one (and why the engine carries
    both): named TYPED state variables (value/list/map) instead of one
    tuple, per-key timers for timeout-driven emission, state TTL
    (``ttlDurationMs`` on getValueState evicts idle keys — the
    unbounded-key-cardinality answer at 100 TB/day), and initial-state
    bootstrap. The processor class is a NESTED definition so cloudpickle
    ships it by value (module-level classes pickle by reference, which
    breaks on workers that don't share the driver's sys.path — the
    package-wide kernel rule).

    Runtime dependency: TWS's driver-side state server requires the
    protobuf package. Where it is absent (this build container) the
    query fails at initialization — the equivalence test self-skips
    there; ``running_user_stats`` (applyInPandasWithState) has no such
    dependency and is the portable form."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n_events bigint, total_value double"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            if self._state.exists():
                n, total = self._state.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [user_id], "n_events": [n], "total_value": [total]}
            )

        # close(): base-class default suffices — no resources to release

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningStats(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
