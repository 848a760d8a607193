"""Semantic unit tests for dup_passages, corpus_shuffle, and mixture_weights
on synthetic corpora (fixture-scale cross-engine equivalence is covered by
test_oracle.py; these pin the *meaning*: shared passages are flagged in both
carriers, the shuffle is a seed-stable permutation, and temperature mixing
up-samples small sources)."""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import pytest

from plan_spark.registry import load_all


@pytest.fixture(scope="module")
def tiny_sf(spark, tmp_path_factory):
    """documents.parquet: docs 1 and 2 embed the SAME 24-token passage inside
    different unique filler; doc 3 is all-unique; doc 4/5 pad source 'small'
    vs the rest in 'big' for the mixing test."""
    d = tmp_path_factory.mktemp("tinysf_pipe")
    passage = " ".join(f"shared{i}" for i in range(24))
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))  # noqa: E731
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                uniq("aa", 20) + " " + passage + " " + uniq("ab", 20),
                uniq("ba", 20) + " " + passage + " " + uniq("bb", 20),
                uniq("ca", 64),
                uniq("da", 30),
                uniq("ea", 30),
            ],
            "lang": ["en"] * 5,
            "source": ["big", "big", "big", "small", "small"],
            "n_chars": [10] * 5,
        }
    )
    docs.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return str(d)


def test_dup_passages_flags_both_carriers_only(spark, tiny_sf):
    out = load_all()["dup_passages"].fn(spark, tiny_sf).toPandas()
    by_id = out.set_index("doc_id")
    # the shared 24-token passage spans >= 2 aligned 8-token windows in each
    # carrier (alignment differs by the 20-token prefixes vs stride 4 —
    # both prefixes are multiples of the stride, so windows line up)
    assert by_id.loc[1, "dup_windows"] >= 2
    assert by_id.loc[2, "dup_windows"] >= 2
    # the all-unique doc has windows but zero duplicated ones
    assert by_id.loc[3, "n_windows"] > 0
    assert by_id.loc[3, "dup_windows"] == 0
    assert by_id.loc[3, "dup_frac"] == 0.0
    # fractions are consistent
    assert (out.dup_windows <= out.n_windows).all()


def test_corpus_shuffle_is_a_seed_stable_permutation(spark, tiny_sf):
    fn = load_all()["corpus_shuffle"].fn
    a = fn(spark, tiny_sf).toPandas().sort_values("shard").reset_index(drop=True)
    b = fn(spark, tiny_sf).toPandas().sort_values("shard").reset_index(drop=True)
    # deterministic: two runs produce identical shard fingerprints
    pd.testing.assert_frame_equal(a, b)
    # a permutation: every doc lands in exactly one shard
    assert a.n_docs.sum() == 5
    # independent re-derivation of one doc's shard + head position
    def hv(doc_id: int) -> int:
        h = hashlib.md5(f"r5:{doc_id}".encode()).hexdigest()
        return int(h[:15], 16)

    hvs = {i: hv(i) for i in [1, 2, 3, 4, 5]}
    for _, row in a.iterrows():
        members = [i for i in hvs if hvs[i] % 64 == row["shard"]]
        assert len(members) == row["n_docs"]
        ordered = sorted(members, key=lambda i: (hvs[i], i))
        assert row["head_doc"] == ordered[0]
        fp = hashlib.md5(",".join(str(i) for i in ordered).encode()).hexdigest()
        assert row["seq_fp"] == fp


def test_mixture_weights_upsample_small_sources(spark, tiny_sf):
    out = load_all()["mixture_weights"].fn(spark, tiny_sf).toPandas()
    big = out[out.source == "big"].iloc[0]
    small = out[out.source == "small"].iloc[0]
    # sqrt temperature flattens: the small source is boosted above its
    # natural share, the big source damped below it
    assert small.boost > 1.0
    assert big.boost < 1.0
    # shares normalize (sequential fold -> exact up to IEEE rounding)
    assert abs(out.share.sum() - 1.0) < 1e-12
    # weights follow tokens^0.5
    assert abs(big.weight - big.n_tokens**0.5) < 1e-9


def test_gap_fill_grid_overlaps_fixture_data(spark):
    """Vacuity guard: the hard-coded grid bounds must keep overlapping the
    regenerated events fixture — if a future fixture shifts its ts range,
    every cell becomes a gap and the oracle check goes green-but-vacuous.
    This asserts real observations land on the grid (and real gaps exist)."""
    from tests.conftest import SF_DIR

    out = load_all()["gap_fill"].fn(spark, SF_DIR).toPandas()
    assert (out.n > 0).any(), "grid no longer overlaps the events fixture"
    assert (out.is_gap == 1).any(), "no gaps: the fill path is untested"


def test_dup_spans_merge_the_shared_passage(spark, tiny_sf):
    """The 24-token shared passage in docs 1/2 must merge into ONE maximal
    span per carrier (not a run of per-window rows), positioned inside the
    20-token unique prefix's shadow; the all-unique doc has no spans."""
    out = load_all()["dup_spans"].fn(spark, tiny_sf).toPandas()
    assert set(out.doc_id) == {1, 2}
    for d in (1, 2):
        spans = out[out.doc_id == d]
        assert len(spans) == 1, f"doc {d}: windows must merge to one span"
        row = spans.iloc[0]
        # the span covers (at least) the aligned windows inside the passage
        assert row.span_tokens >= 16
        assert row.n_windows >= 2
        # the passage starts after the 20-token prefix: position 21
        assert 17 <= row.span_start <= 25
