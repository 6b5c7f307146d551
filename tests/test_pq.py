"""Product quantization: encode, cells, ADC top-k, Lloyd training."""

import pytest


def test_pq_codeword_vectors_encode_to_themselves(spark, sf_dir):
    """Vector c < k IS codeword c in every subspace, so its codes are
    [c]*m, its reconstruction error is 0, and an ADC query with its own
    embedding ranks it first at distance exactly 0."""
    from pyspark.sql import functions as F

    from reffy_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = S.pq_codebooks(emb, m=4, k=8)
    codes = {
        r["vec_id"]: list(r["codes"])
        for r in S.pq_encode(emb.filter(F.col("vec_id") < 8), books).collect()
    }
    for c in range(8):
        assert codes[c] == [c, c, c, c]
    q0 = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    top = S.ann_topk_pq(emb, q0, k=3, m=4, n_codes=8).collect()
    assert top[0]["vec_id"] == 0 and top[0]["pq_dist"] == 0.0


def test_pq_cells_cover_every_vector(spark, sf_dir):
    from reffy_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    cells = S.pq_cells(emb, m=4, k=8).collect()
    assert sum(r["n_vectors"] for r in cells) == 4 * n
    assert all(0 <= r["subspace"] < 4 and 0 <= r["code"] < 8 for r in cells)


def test_pq_encode_plan_zero_shuffle(spark, sf_dir):
    from reffy_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = S.pq_codebooks(emb, m=4, k=8)
    plan = (
        S.pq_encode(emb, books)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Window" not in plan


def test_pq_train_reduces_reconstruction_error(spark, sf_dir):
    from reffy_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    first = S.pq_codebooks(emb, m=4, k=8)
    trained = S.pq_train(emb, m=4, k=8, n_iters=3)
    e_first = S.pq_reconstruction_error(emb, first)
    e_trained = S.pq_reconstruction_error(emb, trained)
    assert e_trained < e_first


def test_pq_dim_must_divide(spark):
    from reffy_spark.operators import similarity as S

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="divisible"):
        S.pq_codebooks(emb, m=2, k=1)


def test_ivfadc_subset_of_probed_cells(spark, sf_dir):
    """IVFADC results come only from the probed IVF cells, scored with
    the same ADC distances ann_topk_pq would give those vectors."""
    from pyspark.sql import functions as F

    from reffy_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q0 = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    top = S.ann_topk_ivfadc(emb, q0, k=10, n_centroids=8, nprobe=2, m=4, n_codes=8)
    rows = top.collect()
    assert 0 < len(rows) <= 10
    # members must belong to the 2 probed cells
    cents = S.ivf_centroids(emb, 8)
    asg = {
        r["vec_id"]: r["centroid_id"]
        for r in S.ivf_assignments(emb, cents).select("vec_id", "centroid_id").collect()
    }
    probed = {asg[r["vec_id"]] for r in rows}
    assert len(probed) <= 2
    # ADC distances agree with the full-scan PQ ranking for those ids
    books = S.pq_codebooks(emb, m=4, k=8)
    full = {
        r["vec_id"]: r["pq_dist"]
        for r in S.ann_topk_pq(emb, q0, k=emb.count(), m=4, n_codes=8, books=books).collect()
    }
    for r in rows:
        assert full[r["vec_id"]] == r["pq_dist"]
