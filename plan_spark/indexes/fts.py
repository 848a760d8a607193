"""Persisted full-text index: posting lists as term-bucketed Parquet.

Reference: storage2's inverted index + BM25 + persistence
(/root/reference/pkg/storage2/fts_index.go:154-330, fts_persistence.go).
Spark-first redesign: the inverted index IS a posting DataFrame
(term, doc_id, tf) written bucketed by term, plus per-doc lengths and a
one-row corpus-stats file. A query is then:

  broadcast(query terms) semi-join posting -> idf/length math -> top-k

No corpus scan, no tokenization at query time; the posting read is pruned
to the query terms (parquet predicate pushdown on the sorted term column).
At 100 TB the posting table is the only big artifact, and it shuffles only
at build time (one groupBy), exactly once.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_K1 = 1.2
_B = 0.75


def _tokens(text_col: str, tokenizer: str) -> F.Column:
    """Normalize + tokenize: space split ("simple"), plus CJK character
    bigrams ("cjk") — the reference ships exactly these two tokenizers
    (fts_index.go Simple + Chinese/Jieba analogue; bigrams are the
    dictionary-free fallback)."""
    toks = F.split(
        F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))), " "
    )
    if tokenizer == "simple":
        return toks
    if tokenizer == "cjk":
        from plan_spark.queries.text_ops import cjk_tokenize

        return cjk_tokenize(toks)
    raise ValueError(f"unknown tokenizer {tokenizer!r} (simple|cjk)")


class FtsIndex:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)

    @property
    def tokenizer(self) -> str:
        meta = os.path.join(self.path, "meta.json")
        if os.path.exists(meta):
            return json.load(open(meta)).get("tokenizer", "simple")
        return "simple"

    def tokenize_query(self, text: str) -> list[str]:
        """Tokenize free query text with the INDEX's tokenizer (a CJK query
        against a bigram index must itself become bigrams)."""
        import pandas as pd

        df = self.spark.createDataFrame(pd.DataFrame({"q": [text]}))
        return df.select(_tokens("q", self.tokenizer).alias("t")).collect()[0].t

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        path: str | None = None,
        tokenizer: str = "simple",
    ) -> "FtsIndex":
        """One pass over the corpus: normalize -> tokenize -> posting
        aggregate (term,doc,tf); doc lengths and corpus stats fall out of
        the same scan. Posting rows are sorted by term within files so the
        term filter at query time prunes row groups via parquet min/max.
        ``tokenizer``: "simple" (space split) or "cjk" (+char bigrams),
        persisted in meta.json so insert()/query tokenization stays
        consistent with the build."""
        idx = cls(spark, path)
        os.makedirs(idx.path, exist_ok=True)
        with open(os.path.join(idx.path, "meta.json"), "w") as fh:
            json.dump({"tokenizer": tokenizer}, fh)
        norm = docs.select(
            F.col(id_col).alias("doc_id"),
            _tokens(text_col, tokenizer).alias("toks"),
        )
        doclen = norm.select("doc_id", F.size("toks").cast("bigint").alias("dl"))
        doclen.write.mode("overwrite").parquet(os.path.join(idx.path, "doclen"))
        posting = (
            norm.select("doc_id", F.explode("toks").alias("term"))
            .groupBy("term", "doc_id")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        (
            posting.repartition(F.col("term"))
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(os.path.join(idx.path, "posting"))
        )
        dl = idx.doclen()
        dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(idx.path, "corpus"))
        return idx

    def posting(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "posting"))

    def doclen(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "doclen"))

    def corpus(self) -> DataFrame:
        self._recover_corpus()
        return self.spark.read.parquet(os.path.join(self.path, "corpus"))

    def _recover_corpus(self) -> None:
        """Self-heal after a crash inside insert()'s stats swap (the shared
        rename-aside recovery, btree.recover_dir): corpus/ missing with
        corpus_old/ present means the crash hit between the two renames —
        restore the old stats; both present means the crash hit before the
        cleanup — reclaim the leftover. Stale-but-present stats (crash
        BEFORE the swap) are sound: BM25 constants lag one insert and the
        next insert's rewrite corrects them from the full doclen table."""
        from plan_spark.indexes.btree import recover_dir

        recover_dir(self.path, "corpus")

    def _bm25(self, posting: DataFrame) -> DataFrame:
        """(doc_id, bm25) over a (pre-pruned) posting DataFrame — the ONE
        scoring pipeline behind search() and search_boolean(), so a k1/b or
        rounding change can never diverge between the two faces."""
        dfreq = posting.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
        idf = F.log(
            (F.col("n_docs") - F.col("dfreq") + F.lit(0.5)) / (F.col("dfreq") + F.lit(0.5))
            + F.lit(1.0)
        )
        tf_part = (F.col("tf") * F.lit(_K1 + 1.0)) / (
            F.col("tf")
            + F.lit(_K1) * (F.lit(1.0 - _B) + F.lit(_B) * F.col("dl") / F.col("avgdl"))
        )
        scored = (
            posting.join(F.broadcast(dfreq), "term")
            .join(self.doclen(), "doc_id")
            .join(F.broadcast(self.corpus()))
            .select("doc_id", (idf * tf_part).alias("s"))
        )
        return scored.groupBy("doc_id").agg(F.round(F.sum("s"), 6).alias("bm25"))

    @staticmethod
    def _order(out: DataFrame, top_k: int | None) -> DataFrame:
        if top_k is None:
            return out.orderBy("doc_id")
        return out.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(top_k)

    def search(self, terms: list[str], top_k: int | None = 10) -> DataFrame:
        """BM25(k1=1.2, b=0.75) over the persisted posting lists.

        Output: (doc_id, bm25) — top_k=None returns all matches ordered by
        doc_id (deterministic; used for oracle comparison)."""
        out = self._bm25(self.posting().filter(F.col("term").isin(*terms)))
        return self._order(out, top_k)

    def search_boolean(
        self,
        must: list[str] | tuple[str, ...] = (),
        should: list[str] | tuple[str, ...] = (),
        must_not: list[str] | tuple[str, ...] = (),
        top_k: int | None = 10,
    ) -> DataFrame:
        """Boolean query over the persisted posting lists (reference
        BooleanSearch, fts_index.go:471-479): a doc qualifies iff it contains
        EVERY ``must`` term and NO ``must_not`` term; the BM25 score sums
        over the must+should terms it contains.

        Posting-list algebra, no corpus scan: must = distinct-term count
        filter (the semi-join chain collapsed into one aggregate), must_not
        = anti join, should = the usual scored union. The posting read is
        pruned to the query vocabulary (parquet min/max on the sorted term
        column), so cost is O(posting rows of the query terms) at any
        corpus size. Output: (doc_id, bm25); top_k=None returns all
        qualifying docs ordered by doc_id (deterministic, oracle-friendly)."""
        must, should, must_not = list(must), list(should), list(must_not)
        score_terms = list(dict.fromkeys(must + should))
        if not score_terms:
            raise ValueError("boolean search needs at least one must/should term")
        p = self.posting().filter(F.col("term").isin(*(score_terms + must_not)))
        out = self._bm25(p.filter(F.col("term").isin(*score_terms)))
        if must:
            mdocs = (
                p.filter(F.col("term").isin(*must))
                .groupBy("doc_id")
                .agg(F.count_distinct("term").alias("nm"))
                .filter(F.col("nm") == len(set(must)))
                .select("doc_id")
            )
            out = out.join(mdocs, "doc_id", "left_semi")
        if must_not:
            nd = p.filter(F.col("term").isin(*must_not)).select("doc_id").distinct()
            out = out.join(nd, "doc_id", "left_anti")
        return self._order(out, top_k)

    def insert(self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> "FtsIndex":
        """Incremental insert: tokenize only the new documents, append their
        posting rows and doc lengths, and rewrite the (one-row) corpus
        stats. Existing posting files are untouched — the same append-only
        shape the reference's buffered incremental index uses
        (incremental_index.go:28-253). Tokenization follows the build's
        persisted tokenizer choice."""
        norm = docs.select(
            F.col(id_col).alias("doc_id"),
            _tokens(text_col, self.tokenizer).alias("toks"),
        )
        norm.select("doc_id", F.size("toks").cast("bigint").alias("dl")).write.mode(
            "append"
        ).parquet(os.path.join(self.path, "doclen"))
        (
            norm.select("doc_id", F.explode("toks").alias("term"))
            .groupBy("term", "doc_id")
            .agg(F.count(F.lit(1)).alias("tf"))
            .repartition(F.col("term"))
            .sortWithinPartitions("term")
            .write.mode("append")
            .parquet(os.path.join(self.path, "posting"))
        )
        # recover FIRST: on a crash image (corpus/ missing, corpus_old/
        # the only copy) the swap below would otherwise rmtree the backup
        # and a second crash would leave NOTHING — the exact unrecoverable
        # state this path exists to prevent
        self._recover_corpus()
        stats_tmp = os.path.join(self.path, "corpus_new")
        self.doclen().agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        ).coalesce(1).write.mode("overwrite").parquet(stats_tmp)
        from plan_spark.indexes.btree import swap_dir

        # rename-aside swap (shared shape): the old rmtree-then-rename left
        # a window where corpus/ was simply GONE — every BM25 query would
        # fail forever with no recovery path
        swap_dir(self.path, stats_tmp, "corpus", "fts.corpus_swap_mid")
        return self
