"""Stop-fingerprint cap under a hot (boilerplate) fingerprint.

MOSS drops over-common fingerprints before matching; our
winnowing_pairs_from_index does the same with a document-frequency cap. A
boilerplate fingerprint shared by f docs would otherwise fan out f^2
candidate rows under ONE join key — the scale-killer shape on real corpora
(license headers, templates). This fixture builds exactly that skew and
asserts the cap bounds the join while true overlaps still surface.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.plans.inventory_ml import (
    _winnowing_index,
    winnowing_pairs_from_index,
)

_BOILERPLATE = " ".join(f"license term {i} applies" for i in range(8))


def _fixture_docs(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    # 40 docs that are NOTHING BUT the same boilerplate -> every one of
    # their fingerprints has df=40, far above the cap
    for i in range(40):
        rows.append((i, _BOILERPLATE))
    # one true near-dup pair built from rare tokens (distinct fingerprints,
    # df=2 each)
    body = " ".join(rng.choice(vocab) for _ in range(120))
    rows.append((100, body + " unique tail alpha"))
    rows.append((101, body + " unique tail beta"))
    # unrelated singleton docs
    for i in range(110, 120):
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(60))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_fingerprint_is_capped_and_true_pairs_survive(spark):
    idx = _winnowing_index(_fixture_docs(spark))

    # the skew exists in the raw index: boilerplate fps have df == 40
    max_df_raw = (
        idx.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df")).first()[0]
    )
    assert max_df_raw == 40

    pairs = winnowing_pairs_from_index(idx, max_df=10, min_shared=3)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}

    # without the cap the 40 boilerplate docs alone would emit
    # C(40,2) = 780 pairs; with it, none of them pair at all
    assert not any(a < 40 and b < 40 for a, b in got), got
    # the rare-fingerprint near-dup pair still surfaces
    assert (100, 101) in got

    # the capped join's key fan-out is bounded by construction
    kept_max_df = (
        idx.join(
            idx.groupBy("fp").agg(F.count(F.lit(1)).alias("df")).filter(
                F.col("df") > 10
            ).select("fp"),
            "fp",
            "left_anti",
        )
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df"))
        .first()[0]
    )
    assert kept_max_df is not None and kept_max_df <= 10
