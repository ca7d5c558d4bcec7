"""Inverted text index — the engine's counterpart of the reference's
Solr indexing bolt ([R] TextIndexerBolt, SURVEY.md §0: extracted
article text was pushed to a Solr index for retrieval; VERDICT r01
'What's missing' #5).

Spark-first shape: the index IS two tables, built relationally and
committed through the same snapshot store as every other crawl output
(no external service):

  postings(token, doc, tf)   one row per (token, document) — the
                             inverted lists, stored row-wise so they
                             shuffle/prune like any other table
  token_df(token, df)        document frequency per token

Both are one hash-aggregate each off the exploded token stream; at
100 TB the explode is map-local, the (token, doc) agg is the only wide
shuffle, and its key space is uniform (tokens × docs).  Lookup is a
broadcast semi-join of the query terms into postings plus a tf-idf
rollup per doc — never a scan of the corpus text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storm_focused_crawler_spark.functions.udfs import tokens_col


def postings(df: DataFrame, doc_col: str, text_col: str) -> DataFrame:
    """(token, doc, tf) — tokenization identical to the relevance
    scorer (functions/udfs.tokens_col: lowercase, split [^a-z0-9]+)."""
    tok = df.select(
        F.col(doc_col).alias("doc"), F.explode(tokens_col(F.col(text_col))).alias("token")
    )
    return tok.groupBy("token", "doc").agg(F.count("*").alias("tf"))


def token_df(post: DataFrame) -> DataFrame:
    """(token, df) document frequencies off the postings table."""
    return post.groupBy("token").agg(F.count("*").alias("df"))


def search(
    spark: SparkSession, post: DataFrame, tdf: DataFrame, n_docs: int,
    terms: list[str], k: int = 10,
) -> DataFrame:
    """Top-k docs by summed tf-idf over *terms* (ln-scaled, smoothed:
    tfidf = (1+ln tf)·ln(1 + N/df)); deterministic (score desc, doc asc).
    """
    q = spark.createDataFrame([(t,) for t in terms], "token string")
    scored = (
        post.join(F.broadcast(q), "token")
        .join(F.broadcast(tdf), "token")
        .withColumn(
            "tfidf",
            (1.0 + F.log("tf")) * F.log(1.0 + F.lit(float(n_docs)) / F.col("df")),
        )
        .groupBy("doc")
        .agg(F.round(F.sum("tfidf"), 6).alias("score"), F.count("*").alias("n_terms"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc").asc()).limit(k)


def search_bm25(
    spark: SparkSession,
    post: DataFrame,
    tdf: DataFrame,
    doc_len: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: list[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k docs by Okapi BM25 (Robertson & Zaragoza 2009) over the
    postings table:

      idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
      s(d)    = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    rounded to 6 dp; deterministic order (score desc, doc asc).
    *doc_len* is (doc, dl).  100 TB shape: the query-term and df
    tables broadcast into the postings scan (a semi-join that prunes
    the inverted lists BEFORE anything shuffles); dl joins on the doc
    key of the already-pruned hits; one per-doc hash agg + a bounded
    top-k window — the corpus text is never touched."""
    from pyspark.sql import Window as W

    q = spark.createDataFrame([(t,) for t in terms], "token string")
    idf = F.log(
        1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    scored = (
        post.join(F.broadcast(q), "token")
        .join(F.broadcast(tdf), "token")
        .join(doc_len, "doc")
        .withColumn(
            "s",
            idf
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))),
        )
        .groupBy("doc")
        .agg(F.round(F.sum("s"), 6).alias("score"), F.count("*").alias("n_terms"))
    )
    rn = F.row_number().over(W.orderBy(F.desc("score"), F.asc("doc")))
    return (
        scored.withColumn("rn", rn).filter(F.col("rn") <= k).drop("rn")
    )


def doc_lengths(post: DataFrame) -> DataFrame:
    """(doc, dl) token counts OFF THE POSTINGS TABLE (dl = sum of term
    frequencies — identical to tokenizing the text again, without the
    second corpus scan)."""
    return post.groupBy("doc").agg(F.sum("tf").alias("dl"))
