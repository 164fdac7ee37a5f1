"""Lineage truncation for iterative and multi-consumer plans.

Iterative operators (connected components' large-star/small-star rounds,
BPE's merge loop, global ranking's frozen partitioning) grow their plan
by one layer per round; without truncation Catalyst re-analyzes an
ever-deeper tree and recovery replays the whole history. Every such site
in this package routes through :func:`truncate_lineage`, which picks the
truncation mechanism from session configuration:

- default: ``localCheckpoint`` — blocks cached on executors, zero
  external storage, the right call on local[N] and for short-lived
  jobs. Caveat at cluster scale: the blocks live ONLY on executors, so
  losing one (preemption, OOM kill) makes the checkpointed data
  unrecoverable and fails the job.
- ``spark.graft.checkpoint.reliable=true``: ``checkpoint`` against the
  directory in ``spark.graft.checkpoint.dir`` (or a checkpoint dir the
  caller already set on the SparkContext) — survives executor loss, the
  posture a 1000-executor 100 TB run wants for any loop long enough
  that re-running it costs more than the checkpoint writes.

Both modes materialize the same rows and preserve partitioning (a
reliable checkpoint writes the RDD's partitions as-is and reads them
back), so operator results are mode-independent —
tests/test_lineage_modes.py pins that for all three iterative
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RELIABLE_CONF = "spark.graft.checkpoint.reliable"
DIR_CONF = "spark.graft.checkpoint.dir"


def truncate_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` and cut its lineage, via ``localCheckpoint``
    (default) or a reliable ``checkpoint`` when the session sets
    ``spark.graft.checkpoint.reliable=true``. The directory comes from
    ``spark.graft.checkpoint.dir`` when set — including when the context
    already has a (possibly stale) checkpoint dir from an earlier caller —
    falling back to the context's current dir otherwise."""
    spark = df.sparkSession
    if spark.conf.get(RELIABLE_CONF, "false").lower() != "true":
        return df.localCheckpoint(eager=eager)
    sc = spark.sparkContext
    ckpt_dir = _resolve_checkpoint_dir(
        spark.conf.get(DIR_CONF, None), sc.getCheckpointDir()
    )
    if ckpt_dir != sc.getCheckpointDir():
        # DIR_CONF reconfigured mid-session: apply it. (Comparing against
        # the context's scheme-resolved form may re-set an equivalent path;
        # setCheckpointDir is idempotent, so that is harmless.)
        sc.setCheckpointDir(ckpt_dir)
    return df.checkpoint(eager=eager)


def _resolve_checkpoint_dir(conf_dir: str | None, existing_dir: str | None) -> str:
    """Pick the reliable-checkpoint directory: an explicit ``DIR_CONF``
    always wins (so reconfiguring it mid-session takes effect instead of
    silently landing checkpoints in the first-ever dir), else a dir the
    caller already set on the SparkContext, else error."""
    if conf_dir:
        return conf_dir
    if existing_dir is not None:
        return existing_dir
    raise ValueError(
        f"{RELIABLE_CONF}=true requires a checkpoint directory: "
        f"set {DIR_CONF} or call "
        "spark.sparkContext.setCheckpointDir(...) first"
    )
