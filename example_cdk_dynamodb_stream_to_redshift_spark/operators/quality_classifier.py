"""Hashed-feature logistic-regression quality classifier.

The CCNet / fastText-style component of a web-corpus pipeline: train a
linear classifier on hashed bag-of-words features against a trusted
target domain (e.g. "looks like Wikipedia"), then score and filter the
raw corpus by the model's probability. Public method (Joulin et al.
2016, Wenzek et al. 2020); Spark-first implementation in the same
bounded-partials style as the k-means trainers:

- features: one Arrow-batched pass tokenizes each document, CRC32-hashes
  tokens into ``dim`` buckets, and L2-normalizes the dense count vector
  — crc32 (not Python ``hash``) so features are deterministic across
  workers, runs, and PYTHONHASHSEED values.
- training: full-batch gradient descent; each epoch is ONE distributed
  kernel pass emitting a per-PARTITION gradient/loss partial (a single
  ``dim+1``-vector per partition — the bounded O(partitions x dim)
  artifact class), reduced on the driver. Only the weight vector is ever
  broadcast; the corpus never shuffles and never reaches the driver.
  The epoch plan is iteration-invariant (only the broadcast changes), so
  there is no per-epoch Catalyst/codegen recompile.
- scoring: the same feature kernel plus a dot product against the
  broadcast weights — one projection, no shuffle; compose the
  probability with ``F.col`` filters downstream.

The reference (sql/queries.sql) has no ML surface; this extends the
training-data-pipeline family per SURVEY.md, next to DSIR importance
weights (which reweight by distribution ratio, where this DISCRIMINATES
with a trained decision boundary).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _feature_kernel(dim: int, text_col: str, id_cols: list[str], extra_py=None):
    """Build a mapInPandas kernel: rows -> (id_cols..., features, extra).

    Self-contained (locals only, stdlib+numpy imports inside): executors
    don't share the driver's sys.path, so nothing here may reference the
    package by name.
    """

    def kernel(batches):
        import zlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            feats = np.zeros((len(pdf), dim), dtype=np.float64)
            for i, text in enumerate(pdf[text_col].tolist()):
                for tok in (text or "").lower().split():
                    feats[i, zlib.crc32(tok.encode("utf-8")) % dim] += 1.0
            norms = np.sqrt((feats * feats).sum(axis=1))
            norms[norms == 0.0] = 1.0
            feats /= norms[:, None]
            out = {c: pdf[c] for c in id_cols}
            out["features"] = list(feats)
            yield pd.DataFrame(out)

    return kernel


def hashed_features(
    docs: DataFrame,
    dim: int = 256,
    text_col: str = "text",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """(id_cols..., features array<double> length ``dim``): L2-normalized
    hashed bag-of-words. Deterministic (crc32 bucketing)."""
    id_cols = id_cols or ["doc_id"]
    schema = ", ".join(
        f"{c} {dict(docs.dtypes)[c]}" for c in id_cols
    ) + ", features array<double>"
    return docs.select(*id_cols, text_col).mapInPandas(
        _feature_kernel(dim, text_col, id_cols), schema
    )


def train_quality_model(
    features: DataFrame,
    label_col: str,
    dim: int = 256,
    epochs: int = 30,
    lr: float = 2.0,
    l2: float = 1e-4,
    feature_col: str = "features",
) -> np.ndarray:
    """Train logistic regression by full-batch GD; returns weights
    (length ``dim`` + 1, bias last). ``label_col`` must be 0/1.

    Each epoch: one kernel pass -> per-partition (gradient, loss, n)
    partials -> driver reduce + step. L2 excludes the bias. Learning
    rate decays 1/sqrt(epoch) for a stable full-batch trajectory.
    """
    sc = features.sparkSession.sparkContext
    src = features.select(
        F.col(feature_col).alias("x"), F.col(label_col).cast("double").alias("y")
    )
    w = np.zeros(dim + 1, dtype=np.float64)
    for epoch in range(epochs):
        bc = sc.broadcast(w)

        def grad_partial(batches):
            import numpy as np
            import pandas as pd

            wv = bc.value
            g = np.zeros_like(wv)
            loss = 0.0
            n = 0
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.asarray(pdf["x"].tolist(), dtype=np.float64)
                y = pdf["y"].to_numpy(dtype=np.float64)
                z = x @ wv[:-1] + wv[-1]
                p = 1.0 / (1.0 + np.exp(-z))
                err = p - y
                g[:-1] += x.T @ err
                g[-1] += err.sum()
                eps = 1e-12
                loss += -(
                    y * np.log(p + eps) + (1.0 - y) * np.log(1.0 - p + eps)
                ).sum()
                n += len(y)
            yield pd.DataFrame({"g": [g.tolist()], "loss": [loss], "n": [n]})

        partials = src.mapInPandas(
            grad_partial, "g array<double>, loss double, n long"
        ).collect()
        g = np.zeros_like(w)
        n_total = 0
        for r in partials:
            g += np.asarray(r["g"], dtype=np.float64)
            n_total += r["n"]
        if n_total == 0:
            return w
        g /= n_total
        g[:-1] += l2 * w[:-1]
        w = w - (lr / np.sqrt(epoch + 1.0)) * g
    return w


def score_quality(
    docs: DataFrame,
    weights: np.ndarray,
    dim: int = 256,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    score_col: str = "quality_score",
) -> DataFrame:
    """(id_cols..., <score_col>): P(label=1) under the trained model —
    the per-document keep probability a curation pipeline thresholds.
    One kernel pass, no shuffle."""
    id_cols = id_cols or ["doc_id"]
    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast(np.asarray(weights, dtype=np.float64))
    feat = _feature_kernel(dim, text_col, id_cols)

    def kernel(batches):
        import numpy as np
        import pandas as pd

        wv = bc.value
        for pdf in feat(batches):
            x = np.asarray(pdf["features"].tolist(), dtype=np.float64)
            z = x @ wv[:-1] + wv[-1]
            out = {c: pdf[c] for c in pdf.columns if c != "features"}
            out["score"] = 1.0 / (1.0 + np.exp(-z))
            yield pd.DataFrame(out)

    schema = ", ".join(
        f"{c} {dict(docs.dtypes)[c]}" for c in id_cols
    ) + ", score double"
    return docs.select(*id_cols, text_col).mapInPandas(kernel, schema).select(
        *id_cols, F.col("score").alias(score_col)
    )
