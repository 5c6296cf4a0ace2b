"""Retrieval primitives over the document corpus: inverted index
construction, BM25 ranking, and token-budget sequence packing.

These are the search/training-prep operators a data pipeline runs after
cleaning and dedup (reference scope: the pipeline's analytics stage,
``scripts/process_sales.py:40-69``, generalized to document retrieval):
build the term index, rank documents for query terms, and pack documents
into fixed token budgets for training batches.

Scale notes are per-operator; the common theme is that every shuffle key
here is either a term (vocabulary-sized) or a (source, bin) pair — never
an unbounded cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.io import load
from sales_data_pipeline_gcp_spark.operators.text import _WORDS_SQL, _words
from sales_data_pipeline_gcp_spark.plans.registry import register

#: Inverted-index posting lists are capped at this many doc ids per term —
#: the cap is what keeps the per-term reduce value bounded at corpus scale
#: (full postings for a stopword-frequency term would be corpus-sized).
POSTINGS_CAP = 20

#: BM25 hyperparameters (the standard Robertson defaults).
BM25_K1 = 1.2
BM25_B = 0.75

#: Fixed query-term set for the ranking query (fixture vocabulary members).
BM25_TERMS = ("vector", "window", "stream")

#: Token budget per packed training sequence.
PACK_BUDGET = 500


@register(
    "q_inverted_index",
    oracle=f"""
    WITH pairs AS (
        SELECT DISTINCT token, doc_id
        FROM (SELECT doc_id, UNNEST({_WORDS_SQL}) AS token FROM documents) t
    )
    SELECT token,
           COUNT(*) AS df,
           array_to_string(list_sort(list(doc_id))[1:{POSTINGS_CAP}], ',')
               AS postings
    FROM pairs
    GROUP BY token
    """,
    doc=f"Inverted-index construction: distinct (term, doc) postings, "
    f"document frequency, and the first {POSTINGS_CAP} doc ids per term "
    "serialized as a CSV string (the driver canonicalizer cannot hash "
    "list cells). Two shuffles — pair-distinct then term-group — both "
    "keyed on the term, so the reduce side is vocabulary-sized, not "
    "corpus-sized; the postings cap bounds the per-term value. At 100 TB "
    "this is the classic map-side-combine shape: explode stays narrow, "
    "the distinct dedups pairs partially before the exchange.",
    tags=("retrieval", "text"),
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = d.select(F.explode(_words()).alias("token"), "doc_id").distinct()
    postings = F.concat_ws(
        ",",
        F.transform(
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, POSTINGS_CAP),
            lambda x: x.cast("string"),
        ),
    )
    return pairs.groupBy("token").agg(
        F.count("*").alias("df"),
        postings.alias("postings"),
    )


@register(
    "q_bm25",
    oracle=f"""
    WITH tokens AS (
        SELECT doc_id, UNNEST({_WORDS_SQL}) AS token FROM documents
    ), dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM tokens GROUP BY doc_id
    ), stats AS (
        SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
               COUNT(*) AS n_docs
        FROM dl
    ), tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM tokens
        WHERE token IN {BM25_TERMS!r}
        GROUP BY doc_id, token
    ), df AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM tokens
        WHERE token IN {BM25_TERMS!r}
        GROUP BY token
    ), scored AS (
        SELECT tf.token, tf.doc_id,
               ((CAST(stats.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5))
                 * (tf.tf * CAST({BM25_K1 + 1} AS DOUBLE))
                 / (tf.tf + {BM25_K1} * ({1 - BM25_B} + {BM25_B}
                                         * (dl.dl / stats.avgdl))) AS bm25
        FROM tf
        JOIN dl ON tf.doc_id = dl.doc_id
        JOIN df ON tf.token = df.token
        CROSS JOIN stats
    )
    SELECT token, doc_id, bm25, CAST(rn AS INTEGER) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY token
                                     ORDER BY bm25 DESC, doc_id) AS rn
        FROM scored
    ) t WHERE rn <= 10
    """,
    doc="BM25 ranking of documents for a fixed query-term set: top-10 docs "
    "per term with the full Robertson saturation formula (k1=1.2, "
    "b=0.75), except the idf log is left un-applied — idf here is the "
    "log's rational ARGUMENT (N-df+0.5)/(df+0.5), which is "
    "rank-monotone with true BM25 and keeps every arithmetic op "
    "IEEE-identical across engines (libm log differs in the last ulp). "
    "Scores are emitted per (term, doc) — never summed across terms — "
    "so no float accumulation exists anywhere in the plan. Corpus stats "
    "(N, avgdl) broadcast as a single row; tf filters to the query "
    "terms BEFORE its group-by, so the shuffle carries only "
    "matching-term rows.",
    tags=("retrieval", "text"),
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    tokens = d.select("doc_id", F.explode(_words()).alias("token"))
    dl = tokens.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        F.count("*").alias("n_docs"),
    )
    qt = tokens.filter(F.col("token").isin(*BM25_TERMS))
    tf = qt.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = qt.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    idf = (F.col("n_docs").cast("double") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    denom = F.col("tf") + BM25_K1 * (
        F.lit(1 - BM25_B) + BM25_B * (F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(stats))
        .select(
            "token",
            "doc_id",
            (idf * (F.col("tf") * (BM25_K1 + 1)) / denom).alias("bm25"),
        )
    )
    w = W.partitionBy("token").orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return (
        scored.select("*", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= 10)
        .select("token", "doc_id", "bm25", F.col("rank").cast("int").alias("rank"))
    )


@register(
    "q_seq_pack",
    oracle=f"""
    WITH toks AS (
        SELECT source, doc_id, len({_WORDS_SQL}) AS n_tokens
        FROM documents
    ), binned AS (
        SELECT source, doc_id, n_tokens,
               CAST(FLOOR(CAST(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) / {PACK_BUDGET}.0) AS INTEGER) AS bin_id
        FROM toks
    )
    SELECT source, bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM binned
    GROUP BY source, bin_id
    """,
    doc=f"Token-budget sequence packing ({PACK_BUDGET} tokens per bin): the "
    "training-batch prep step that concatenates documents until a context "
    "budget fills. Deterministic contiguous packing — docs ordered by id "
    "within each source shard, bin = floor(exclusive-cumulative-tokens / "
    "budget) — the streaming-friendly variant of first-fit (a doc that "
    "straddles a boundary starts its bin; no lookahead, no bin-packing "
    "search). The running sum is a per-SOURCE window, not a corpus-global "
    "one, so at scale each shard packs independently — the window "
    "parallelizes across sources exactly like real pipelines pack "
    "per-shard. Token counts are integers; the only division is by the "
    "budget constant (exact doubles far below 2^53).",
    tags=("retrieval", "text"),
)
def q_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents").select("source", "doc_id", "text")
    toks = d.select("source", "doc_id", F.size(_words()).cast("bigint").alias("n_tokens"))
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    binned = toks.select(
        "source",
        "doc_id",
        "n_tokens",
        F.floor(cum_before / float(PACK_BUDGET)).cast("int").alias("bin_id"),
    )
    return binned.groupBy("source", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
