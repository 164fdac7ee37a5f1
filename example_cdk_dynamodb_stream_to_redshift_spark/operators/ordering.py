"""Deterministic epoch shuffling: the "randomize the corpus order for
training" step, as a seed-keyed pseudo-random permutation instead of a
stateful shuffle.

Training runs need every epoch to visit documents in a different,
REPRODUCIBLE random order, sharded so a thousand loader workers can
each read one slice sequentially. ``rand()`` fails both requirements
(partition-order-dependent, unreproducible across re-ingestions); a
global ``ORDER BY random()`` also serializes into a full sort. This
module keys the permutation on content-independent identity instead:

    h = md5(seed || ':' || id)

which is a fixed bijection per seed (md5 collisions aside — 2^-64
territory at any corpus size), so the "shuffle" is a pure PROJECTION:
shard = an 8-hex-digit prefix of ``h`` mod ``n_shards`` (uniform), and
the within-shard order is ``h`` itself. A new epoch is a new seed —
same data, different permutation, zero state carried. Re-running any
epoch re-derives the identical order (the bottom-k/bottomk.py
rand()-free argument, applied to ordering).

Scale shape: ``epoch_order`` adds two codegen'd columns — NO shuffle,
no window, no global sort; ``epoch_order_write`` pays exactly ONE
exchange (repartition by shard) plus task-local sorts, then writes one
directory per shard (the loader contract: readers scan ``shard=K``
sequentially, already in order). Source interleaving comes free: a
uniform hash order mixes sources within every shard in corpus
proportion — no separate stratified interleave pass.

Reference scope: the reference app (damc-dev/example-cdk-dynamodb-
stream-to-redshift) has no training-order surface; this extends the
engine for training-data pipelines per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_key(id_col: Column | str, seed: int) -> Column:
    """The permutation key: ``md5(seed || ':' || id)`` — deterministic,
    seed-parameterized, restatable verbatim in any engine with md5
    (DuckDB parity pinned in tests/test_ordering.py). The ``:``
    separator keeps (seed=1, id=23) and (seed=12, id=3) distinct."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(
        F.concat(F.lit(str(int(seed))), F.lit(":"), c.cast("string"))
    )


def epoch_order(
    df: DataFrame, id_col: str, seed: int, n_shards: int
) -> DataFrame:
    """``df`` plus ``(h, shard)``: the epoch's permutation key and the
    uniform shard assignment (first 8 hex digits of ``h`` mod
    ``n_shards``). Pure projection — sorting/shuffling is deferred to
    the consumer (``epoch_order_write``, or an ORDER BY h LIMIT k
    peek). Training order within a shard is ascending ``h``; the
    global epoch order is (shard, h), though loaders normally consume
    shards independently. NULL ids are dropped (a NULL key has no
    identity to permute; its ``h`` is NULL and the row is filtered) —
    pinned in tests/test_ordering.py."""
    _check_output_names(df, n_shards)
    return _with_order_columns(
        df.filter(F.col(id_col).isNotNull()), epoch_key(id_col, seed), n_shards
    )


def _check_output_names(df: DataFrame, n_shards: int) -> None:
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    # case-insensitive: Spark's default resolution is case-insensitive,
    # so withColumn("h", ...) would clobber an existing "H" too
    taken = [c for c in df.columns if c.lower() in ("h", "shard")]
    if taken:
        raise ValueError(
            f"input already has column(s) {taken}; epoch ordering would "
            "silently overwrite them — rename or drop them first."
        )


def _with_order_columns(df: DataFrame, key: Column, n_shards: int) -> DataFrame:
    """Append the permutation key and its uniform shard: the single
    definition both order flavors (and their DuckDB parity oracles in
    tests/test_ordering.py) share."""
    return df.withColumn("h", key).withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring("h", 1, 8), 16, 10).cast("long"),
            F.lit(int(n_shards)),
        ).cast("int"),
    )


def repeated_epoch_order(
    df: DataFrame, id_col: str, repeat_col: str, seed: int, n_shards: int
) -> DataFrame:
    """Repetition-aware epoch order: each row appears ``repeat_col``
    times (an INTEGRAL per-doc repeat factor — "4 epochs of wiki, 1 of
    crawl", the output shape of mixture planning), each occurrence
    with its own key ``md5(seed || ':' || id || '#' || k)`` so repeats
    of one document scatter across the whole epoch instead of
    clumping. Rows with repeat <= 0 (or NULL) drop out — that IS the
    zero-weight semantics. Still a pure projection + explode: no
    shuffle, no state; a non-integral repeat column raises rather than
    silently truncating (the selection.py weight contract)."""
    dt = dict(df.dtypes).get(repeat_col)
    if dt not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"repeat column {repeat_col!r} must be an integral repeat "
            f"factor; got {dt}. Round explicitly if truncation is "
            "really intended."
        )
    _check_output_names(df, n_shards)
    # sequence(1, n) with n < 1 would generate a DESCENDING sequence
    # (the shingles() pitfall), so non-positive/NULL repeats must become
    # an empty array — explode then drops the row, which IS the
    # zero-weight semantics
    n = F.col(repeat_col).cast("long")
    k = "_rep_k"
    # Spark name resolution is case-insensitive (the _check_output_names
    # rule), so compare lowercased: an input column `_REP_K` collides too.
    while k in (c.lower() for c in df.columns):
        k = "_" + k
    rep = F.explode(
        F.when(n >= 1, F.sequence(F.lit(1).cast("long"), n)).otherwise(
            F.array().cast("array<long>")
        )
    ).alias(k)
    c = F.col(id_col)
    out = df.filter(c.isNotNull()).select("*", rep)
    # per-copy identity "id#k" through the SAME key/shard definition as
    # the plain epoch order
    copy_id = F.concat(c.cast("string"), F.lit("#"), F.col(k).cast("string"))
    return _with_order_columns(out, epoch_key(copy_id, seed), n_shards).drop(k)


def epoch_order_write(
    df: DataFrame, path: str, id_col: str, seed: int, n_shards: int
) -> None:
    """Materialize one epoch: one exchange keyed by shard, task-local
    sort on (shard, h), one ``shard=K`` directory per shard with rows
    already in reading order. Re-running the same (seed, corpus) is
    bit-identical; the next epoch is the same call with seed+1."""
    (
        epoch_order(df, id_col, seed, n_shards)
        .repartition(int(n_shards), "shard")
        .sortWithinPartitions("shard", "h")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
