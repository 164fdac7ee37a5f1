"""Product-quantization ANN (operators/pq.py): losslessness in the
degenerate config, recall of the lossy config, code-table shape, and the
driver-side q6 rounding twin."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from example_cdk_dynamodb_stream_to_redshift_spark.operators import pq as PQ
from example_cdk_dynamodb_stream_to_redshift_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def emb(spark):
    random.seed(7)
    rows = [
        (i, [random.gauss(0, 1) for _ in range(16)]) for i in range(80)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()


def _query_vec(emb):
    return [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]


def test_lossless_config_matches_brute_force_bitwise(spark, emb):
    # K >= |corpus|, iters=0: codebooks contain every subvector, ADC in the
    # integer-parity path must equal cosine_q6 brute force EXACTLY
    books = PQ.train_pq_codebooks(emb, m=4, n_centroids=80, iters=0, dim=16)
    codes = PQ.pq_encode(emb, books)
    qvec = _query_vec(emb)
    got = PQ.pq_adc_topk(
        codes, qvec, books, k=10, exact_engine_parity=True
    ).collect()
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    want = SIM.brute_force_topk(
        emb, query, k=10, exact_engine_parity=True
    ).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in got] == [
        (r["vec_id"], r["cos_sim"]) for r in want
    ]


def test_lossy_config_recall(spark, emb):
    books = PQ.train_pq_codebooks(emb, m=8, n_centroids=16, iters=2, dim=16)
    codes = PQ.pq_encode(emb, books)
    qvec = _query_vec(emb)
    got = {r["vec_id"] for r in PQ.pq_adc_topk(codes, qvec, books, k=10).collect()}
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    want = {r["vec_id"] for r in SIM.brute_force_topk(emb, query, k=10).collect()}
    # lossy codes: not exact, but the quantizer must keep most of the true
    # top-10 (m=8 subspaces of dim 2 at K=16 is a fine grid at this scale)
    assert len(got & want) >= 6
    assert 0 in got  # the query vector itself reconstructs closest to q


def test_codes_shape_and_range(spark, emb):
    books = PQ.train_pq_codebooks(emb, m=4, n_centroids=8, iters=1, dim=16)
    codes = PQ.pq_encode(emb, books)
    rows = codes.collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r["codes"]) == 4
        assert all(0 <= c < 8 for c in r["codes"])


def test_training_reduces_distortion(spark, emb):
    def distortion(books):
        codes = PQ.pq_encode(emb, books)
        # decode: per-subspace centroid lookup, L2 to the original
        d_sub = len(books[0][0])
        joined = emb.join(codes, "vec_id")
        recon = F.flatten(
            F.zip_with(
                F.col("codes"),
                F.lit([[list(map(float, c)) for c in b] for b in books]),
                lambda c, book: F.element_at(book, c + F.lit(1)),
            )
        )
        err = F.aggregate(
            F.zip_with(
                F.transform(F.col("embedding"), lambda x: x.cast("double")),
                recon,
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        return joined.agg(F.sum(err)).first()[0]

    init = PQ.train_pq_codebooks(emb, m=4, n_centroids=8, iters=0, dim=16)
    trained = PQ.train_pq_codebooks(emb, m=4, n_centroids=8, iters=3, dim=16)
    assert distortion(trained) < distortion(init)


def test_py_q6_matches_spark_round(spark):
    # HALF_UP away-from-zero on the exact .5 grid — the driver-side table
    # builder must agree with F.round or the parity path drifts
    vals = [0.0000005, -0.0000005, 1.2345675, -1.2345675, 0.1, -0.9999995]
    df = spark.createDataFrame([(v,) for v in vals], "x double").select(
        F.round(F.col("x") * 1_000_000).cast("long").alias("q")
    )
    assert [r["q"] for r in df.collect()] == [PQ._py_q6(v) for v in vals]


def test_ivfpq_exact_config_matches_brute_force(spark, emb):
    from example_cdk_dynamodb_stream_to_redshift_spark.operators import (
        similarity as S,
    )

    centroids = S.train_ivf_centroids(emb, n_centroids=4, iters=2)
    books = PQ.train_pq_codebooks(emb, m=4, n_centroids=80, iters=0, dim=16)
    index = PQ.build_ivfpq_index(emb, centroids, books)
    qvec = _query_vec(emb)
    got = PQ.ivfpq_topk(
        index, qvec, centroids, books, k=10, nprobe=4, exact_engine_parity=True
    ).collect()
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    want = SIM.brute_force_topk(
        emb, query, k=10, exact_engine_parity=True
    ).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in got] == [
        (r["vec_id"], r["cos_sim"]) for r in want
    ]


def test_ivfpq_partial_probe_recall(spark, emb):
    from example_cdk_dynamodb_stream_to_redshift_spark.operators import (
        similarity as S,
    )

    centroids = S.train_ivf_centroids(emb, n_centroids=4, iters=2)
    books = PQ.train_pq_codebooks(emb, m=8, n_centroids=16, iters=2, dim=16)
    index = PQ.build_ivfpq_index(emb, centroids, books)
    qvec = _query_vec(emb)
    got = {
        r["vec_id"]
        for r in PQ.ivfpq_topk(index, qvec, centroids, books, k=10, nprobe=2).collect()
    }
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    want = {r["vec_id"] for r in SIM.brute_force_topk(emb, query, k=10).collect()}
    # two approximations stack (half the lists + lossy codes): still most
    # of the true top-10, and the query vector itself must survive
    assert len(got & want) >= 5
    assert 0 in got


def test_expr_literals_bitwise_equal_f_lit(spark):
    """double_array_lit/double_matrix_lit/_lut_lit build literals via ONE
    SQL parse instead of a py4j call per element; the parsed doubles must
    be BIT-identical to F.lit's (repr round-trip + correctly-rounded
    parser), or every quantized cosine downstream shifts by ulps."""
    import struct as st

    random.seed(11)
    vals = [random.uniform(-1e6, 1e6) for _ in range(64)] + [
        0.0, -0.0, 1e-308, -1.5e300, 0.1, 1.0 / 3.0, 2.0**-52, 1e-05,
        # non-finite: repr would emit infD/nanD, which the parser rejects —
        # a degenerate codebook (zero-norm inputs) must score, not fail at
        # expression parse (ADVICE r6)
        float("inf"), float("-inf"), float("nan"),
    ]
    row = spark.range(1).select(
        SIM.double_array_lit(vals).alias("a"),
        F.array(*[F.lit(float(v)) for v in vals]).alias("b"),
        SIM.double_matrix_lit([vals[:8], vals[8:16]]).alias("m"),
        F.lit([[float(v) for v in vals[:8]], [float(v) for v in vals[8:16]]]).alias("n"),
        PQ._lut_lit([[1, -5, 2**62]], "long").alias("l"),
    ).first()
    bits = lambda xs: [st.pack(">d", x) for x in xs]  # noqa: E731
    assert bits(row["a"]) == bits(row["b"])
    assert [bits(r) for r in row["m"]] == [bits(r) for r in row["n"]]
    assert row["l"] == [[1, -5, 2**62]]
    with pytest.raises(ValueError):
        PQ._lut_lit([[1.0]], "int")


def test_expr_literals_empty_arrays_keep_types(spark):
    row = spark.range(1).select(
        SIM.double_array_lit([]).alias("d"),
        SIM.long_array_lit([]).alias("l"),
        SIM.double_matrix_lit([]).alias("m"),
        SIM.double_matrix_lit([[], []]).alias("mr"),
    )
    assert [f.dataType.simpleString() for f in row.schema.fields] == [
        "array<double>", "array<bigint>",
        "array<array<double>>", "array<array<double>>",
    ]
    r = row.first()
    assert (r["d"], r["l"], r["m"], r["mr"]) == ([], [], [], [[], []])


def test_rerank_recovers_exact_topk_from_lossy_shortlist(spark, emb):
    """The two-phase serving pattern: a LOSSY ADC shortlist (k=40 of 80)
    exactly reranked against the raw vectors must reproduce the true
    top-10 id-for-id — including orderings ADC cannot see (vectors
    sharing a code score identically under ADC)."""
    books = PQ.train_pq_codebooks(emb, m=8, n_centroids=16, iters=2, dim=16)
    codes = PQ.pq_encode(emb, books)
    qvec = _query_vec(emb)
    shortlist = PQ.pq_adc_topk(codes, qvec, books, k=40)
    got = PQ.pq_rerank_topk(
        shortlist, emb, qvec, k=10, exact_engine_parity=True
    ).collect()
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    want = SIM.brute_force_topk(
        emb, query, k=10, exact_engine_parity=True
    ).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in got] == [
        (r["vec_id"], r["cos_sim"]) for r in want
    ]


def test_rerank_is_broadcast_semi_join(spark, emb):
    """The corpus side of the rerank must be one broadcast-semi-join
    hash-probe scan — no shuffle of non-candidate rows, no BNLJ."""
    books = PQ.train_pq_codebooks(emb, m=4, n_centroids=8, iters=1, dim=16)
    codes = PQ.pq_encode(emb, books)
    qvec = _query_vec(emb)
    shortlist = PQ.pq_adc_topk(codes, qvec, books, k=20)
    plan = PQ.pq_rerank_topk(shortlist, emb, qvec, k=5)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan
