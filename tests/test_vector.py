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
