"""Semantic unit tests for tfidf_topk and dedup_containment on synthetic
corpora (the fixture-scale oracle equivalence is covered by test_oracle.py;
these pin the *meaning*: containment finds subset docs Jaccard misses, and
TF-IDF ranks doc-specific terms above corpus-common ones)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from plan_spark.registry import load_all


@pytest.fixture(scope="module")
def tiny_sf(spark, tmp_path_factory):
    """A miniature sf dir holding only documents.parquet: doc 1 is a verbatim
    excerpt of doc 2 (subset dup), doc 3 shares nothing, docs 4/5 are about
    distinct topics over a shared stopword-ish base."""
    d = tmp_path_factory.mktemp("tinysf")
    excerpt = "alpha beta gamma delta epsilon zeta eta theta " * 3
    big = ("filler words everywhere around here " * 20) + excerpt + (
        " more filler trailing text goes here " * 20
    )
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                excerpt,
                big,
                "totally unrelated content about llamas and alpacas grazing",
                "spark spark spark engine engine common common common words",
                "duck duck duck database database common common common words",
            ],
            "lang": ["en"] * 5,
            "source": ["t"] * 5,
            "n_chars": [len(excerpt), len(big), 58, 59, 60],
        }
    )
    docs.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return str(d)


def test_containment_finds_subset_dup_jaccard_misses(spark, tiny_sf):
    reg = load_all()
    out = reg["dedup_containment"].fn(spark, tiny_sf).toPandas()
    pair = out[(out.da == 1) & (out.db == 2)]
    assert len(pair) == 1
    row = pair.iloc[0]
    # doc 1's shingle set is fully inside doc 2's
    assert row.c_a_in_b == 1.0
    # ...but the symmetric direction (and hence Jaccard) is far smaller
    assert row.c_b_in_a < 0.5
    # the unrelated doc never pairs
    assert not ((out.da == 3) | (out.db == 3)).any()


def test_tfidf_ranks_doc_specific_terms_first(spark, tiny_sf):
    reg = load_all()
    out = reg["tfidf_topk"].fn(spark, tiny_sf).toPandas()
    top4 = out[(out.doc_id == 4) & (out.rk == 1)].iloc[0]
    top5 = out[(out.doc_id == 5) & (out.rk == 1)].iloc[0]
    # the doc-unique repeated term beats the cross-doc 'common' term
    assert top4.tk == "spark" and top5.tk == "duck"
    common4 = out[(out.doc_id == 4) & (out.tk == "common")]
    assert len(common4) == 1 and common4.iloc[0].score < top4.score
    # ranks are dense 1..k per doc and scores non-increasing
    for did, grp in out.groupby("doc_id"):
        grp = grp.sort_values("rk")
        assert list(grp.rk) == list(range(1, len(grp) + 1))
        assert (grp.score.diff().dropna() <= 0).all()
