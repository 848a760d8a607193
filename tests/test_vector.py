"""IVF approximate KNN quality: recall@5 against the exact brute-force
result (the reference validates IVF the same way — sdk/knn_test.go)."""

from __future__ import annotations

from plan_spark.queries.vector_ops import knn_brute, knn_ivf
from tests.conftest import SF_DIR


def test_ivf_recall(spark):
    exact = {
        (r.q_id, r.c_id) for r in knn_brute(spark, SF_DIR).collect()
    }
    approx = {
        (r.q_id, r.c_id) for r in knn_ivf(spark, SF_DIR).collect()
    }
    recall = len(exact & approx) / len(exact)
    # nprobe=4 of k=16 on random embeddings: recall is imperfect by design,
    # but must be well above chance
    assert recall >= 0.5, f"IVF recall@5 too low: {recall}"


def test_emb_gram_matches_numpy(spark):
    """The distributed gramian equals numpy's X^T X on the same slice —
    certifies the map-side cell expansion + partial-agg pipeline that a
    driver-side eigendecomposition (distributed PCA) would consume."""
    import numpy as np

    from plan_spark.queries.vector_ops import _GRAM_D, emb_gram
    from tests.conftest import SF_DIR

    got = {(r.i, r.j): r.xtx for r in emb_gram(spark, SF_DIR).collect()}
    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("embedding")
        .collect()
    )
    X = np.array([r.embedding[:_GRAM_D] for r in rows], dtype=np.float64)
    ref = X.T @ X
    for i in range(_GRAM_D):
        for j in range(_GRAM_D):
            # decimal(10,5) input rounding: ~1e-5/row error bound
            assert abs(got[(i, j)] - ref[i, j]) < 1e-3 * max(1.0, abs(ref[i, j]))
