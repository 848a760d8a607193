"""CJK tokenization: bigram expansion + BM25 search over a mixed-language
corpus (reference ships Simple + Chinese tokenizers, fts_index.go; the
driver fixture is Latin-only, so real CJK behavior is pinned here)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from plan_spark.indexes.fts import FtsIndex
from plan_spark.queries.text_ops import cjk_tokenize

_CORPUS = [
    (1, "spark 引擎 处理 分布式 数据"),  # spaced zh: tokens then bigrams
    (2, "分布式"),  # unspaced zh: pure bigram path (and shortest doc)
    (3, "spark is a distributed engine"),  # ascii passthrough
    (4, "こんにちは世界"),  # japanese
    (6, "大规模分布式系统"),  # unspaced zh phrase CONTAINING the query
]


def test_cjk_bigram_expansion(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": [["ab", "中文分词", "字"]]}))
    got = df.select(cjk_tokenize(F.col("t")).alias("x")).collect()[0].x
    # ascii token passes through; 4-char CJK -> 3 bigrams; single char whole
    assert got == ["ab", "中文", "文分", "分词", "字"]


def test_cjk_index_search_and_insert(spark, tmp_path):
    docs = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    idx = FtsIndex.build(
        spark, docs, path=str(tmp_path / "fts_cjk"), tokenizer="cjk"
    )
    assert idx.tokenizer == "cjk"

    # query text is tokenized with the index's tokenizer -> bigrams
    terms = idx.tokenize_query("分布式")
    assert terms == ["分布", "布式"]
    hits = {r.doc_id for r in idx.search(terms, top_k=None).collect()}
    assert hits == {1, 2, 6}  # zh docs containing 分布式; ascii/ja do not

    # ranking: doc 2 is shorter => higher bm25 for the same tf
    ranked = [r.doc_id for r in idx.search(terms, top_k=2).collect()]
    assert ranked[0] == 2

    # incremental insert keeps the persisted tokenizer
    idx.insert(spark.createDataFrame([(5, "全新分布式系统")], "doc_id long, text string"))
    hits = {r.doc_id for r in idx.search(terms, top_k=None).collect()}
    assert hits == {1, 2, 5, 6}

    # the simple tokenizer finds the query only as a whole space-delimited
    # token (docs 1 and 2) — it cannot see it INSIDE unspaced text (doc 6);
    # that recall gap is exactly what the bigram tokenizer closes
    simple = FtsIndex.build(
        spark, docs, path=str(tmp_path / "fts_simple"), tokenizer="simple"
    )
    assert {r.doc_id for r in simple.search(["分布式"], top_k=None).collect()} == {1, 2}
