"""Text-analysis operators for training-data pipelines (SURVEY.md §2.4):
token counting, term statistics, quality scoring, language ID, and
order-sensitive document fingerprinting. All five are oracled.

Everything is built-in expressions (split/explode/regexp/aggregate) — no
Python in the hot path; each doc is processed independently (narrow) until
the final aggregation, so the pipelines scale linearly with corpus size.

Honesty note: the fixture corpus uses one shared vocabulary for every
``lang`` value, so language-ID *accuracy* is untestable here — what the
oracle verifies is that the scoring mechanism is deterministic and
identical cross-engine. The stopword profiles below are tiny on purpose;
a production profile is a per-language table you'd broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_data_pipeline_gcp_spark.functions.hashing import shared_hash, sql_shared_hash
from sales_data_pipeline_gcp_spark.io import fan_out, load
from sales_data_pipeline_gcp_spark.plans.registry import register

_WORDS_SQL = "list_filter(string_split(text, ' '), w -> w <> '')"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "zu"],
    "fr": ["le", "la", "de", "et", "un"],
}

TOP_TERMS = 20

#: rolling-hash parameters (token hash folded in document order)
FP_TOKEN_MOD = 1_000_003
FP_MULT = 31
FP_MOD = 2_147_483_647


def _words(col="text"):
    return F.filter(F.split(F.col(col), " "), lambda w: w != F.lit(""))


@register(
    "q_text_tokens",
    oracle=f"""
    SELECT doc_id,
           lang,
           len({_WORDS_SQL})                                   AS n_tokens,
           len(list_distinct({_WORDS_SQL}))                    AS n_distinct,
           len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))     AS n_bpeish,
           n_chars
    FROM documents
    """,
    doc="Token counting per document: whitespace tokens, distinct tokens, "
    "and a BPE-ish regex segmentation (words + standalone punctuation) — "
    "the standard pre-tokenizer shape.",
    tags=("text",),
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        F.size(_words()).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(_words())).cast("long").alias("n_distinct"),
        F.regexp_count(F.col("text"), F.lit(r"\w+|[^\w\s]")).cast("long").alias("n_bpeish"),
        "n_chars",
    )


@register(
    "q_text_termstats",
    oracle=f"""
    SELECT token,
           COUNT(*)                 AS n_occurrences,
           COUNT(DISTINCT doc_id)   AS n_docs
    FROM (SELECT doc_id, UNNEST({_WORDS_SQL}) AS token FROM documents) t
    GROUP BY token
    ORDER BY n_occurrences DESC, token
    LIMIT {TOP_TERMS}
    """,
    doc="Corpus term statistics: explode tokens, count occurrences and "
    "document frequency, top-N by frequency with deterministic tie-break. "
    "Partial aggregation collapses each partition's counts before the "
    "shuffle — vocabulary-sized exchange, not corpus-sized.",
    tags=("text",),
)
def q_text_termstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(_words()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(TOP_TERMS)
    )


_EN_LIST_SQL = "['" + "','".join(STOPWORDS["en"]) + "']"


@register(
    "q_text_quality",
    oracle=f"""
    WITH w AS (SELECT doc_id, n_chars, {_WORDS_SQL} AS ws FROM documents)
    SELECT doc_id,
           n_chars,
           len(ws) AS n_tokens,
           CAST(n_chars AS DOUBLE) / len(ws)                          AS avg_token_len,
           CAST(len(list_filter(ws, t -> list_contains({_EN_LIST_SQL}, t))) AS DOUBLE)
             / len(ws)                                                AS stopword_ratio,
           CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)           AS distinct_ratio,
           (len(ws) BETWEEN 20 AND 1000)
             AND (CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) > 0.1)  AS keep
    FROM w
    WHERE len(ws) > 0
    """,
    doc="Quality scoring per document: length, average token length, "
    "stopword ratio, lexical diversity (distinct ratio), and a boolean "
    "keep-gate — the standard cheap quality filter before expensive "
    "pipeline stages.",
    tags=("text",),
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars", _words().alias("ws"))
    d = d.filter(F.size("ws") > 0)
    n_tokens = F.size("ws").cast("long")
    stop_lit = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n_stop = F.size(F.filter(F.col("ws"), lambda t: F.array_contains(stop_lit, t)))
    n_distinct = F.size(F.array_distinct(F.col("ws")))
    distinct_ratio = n_distinct.cast("double") / n_tokens
    return d.select(
        "doc_id",
        "n_chars",
        n_tokens.alias("n_tokens"),
        (F.col("n_chars").cast("double") / n_tokens).alias("avg_token_len"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        (((n_tokens >= 20) & (n_tokens <= 1000)) & (distinct_ratio > 0.1)).alias("keep"),
    )


def _langid_sql() -> str:
    ratio_cols = []
    for lang, words in STOPWORDS.items():
        lst = "['" + "','".join(words) + "']"
        ratio_cols.append(
            f"CAST(len(list_filter(ws, t -> list_contains({lst}, t))) AS DOUBLE) / len(ws) AS r_{lang}"
        )
    ratios = ",\n           ".join(ratio_cols)
    # deterministic argmax: fixed evaluation order, strict > for later langs
    return f"""
    w AS (SELECT doc_id, lang AS lang_label, {_WORDS_SQL} AS ws FROM documents),
    scored AS (
        SELECT doc_id, lang_label,
           {ratios}
        FROM w WHERE len(ws) > 0
    )
    """


@register(
    "q_text_langid",
    oracle=f"""
    WITH {_langid_sql().strip()}
    SELECT doc_id, lang_label, r_en, r_de, r_fr,
           CASE
             WHEN GREATEST(r_en, r_de, r_fr) < 0.01 THEN 'und'
             WHEN r_en >= r_de AND r_en >= r_fr THEN 'en'
             WHEN r_de >= r_fr THEN 'de'
             ELSE 'fr'
           END AS predicted
    FROM scored
    """,
    doc="Stopword-profile language ID: per-language stopword hit-ratio, "
    "deterministic argmax with fixed precedence, 'und' below a floor. "
    "(Fixture corpus is same-vocab across langs — mechanism, not accuracy, "
    "is what's verifiable here.)",
    tags=("text",),
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("lang_label"), _words().alias("ws")
    )
    d = d.filter(F.size("ws") > 0)
    n = F.size("ws").cast("double")
    ratios = {}
    for lang, words in STOPWORDS.items():
        lst = F.array(*[F.lit(s) for s in words])
        ratios[lang] = (
            F.size(F.filter(F.col("ws"), lambda t: F.array_contains(lst, t))).cast("double") / n
        )
    predicted = (
        F.when(F.greatest(ratios["en"], ratios["de"], ratios["fr"]) < 0.01, F.lit("und"))
        .when((ratios["en"] >= ratios["de"]) & (ratios["en"] >= ratios["fr"]), F.lit("en"))
        .when(ratios["de"] >= ratios["fr"], F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return d.select(
        "doc_id",
        "lang_label",
        ratios["en"].alias("r_en"),
        ratios["de"].alias("r_de"),
        ratios["fr"].alias("r_fr"),
        predicted.alias("predicted"),
    )


@register(
    "q_text_fingerprint",
    oracle=f"""
    WITH w AS (
        SELECT doc_id,
               list_transform({_WORDS_SQL},
                   t -> {sql_shared_hash('t')} % {FP_TOKEN_MOD}) AS hs
        FROM documents
    )
    SELECT doc_id,
           list_reduce(hs, (a, b) -> (a * {FP_MULT} + b) % {FP_MOD}) AS fingerprint
    FROM w
    WHERE len(hs) > 0
    """,
    doc="Order-sensitive document fingerprint: polynomial rolling hash over "
    "the token-hash sequence (acc*31 + h mod p). Unlike md5(text), it's "
    "computed from the token stream so it survives whitespace "
    "normalization; unlike minhash it is order-sensitive.",
    tags=("text",),
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    hs = F.transform(_words(), lambda t: shared_hash(t) % FP_TOKEN_MOD)
    d = d.select("doc_id", hs.alias("hs")).filter(F.size("hs") > 0)
    # DuckDB list_reduce seeds with the first element; mirror that exactly.
    fp = F.aggregate(
        F.slice(F.col("hs"), 2, F.size("hs") - 1),
        F.element_at(F.col("hs"), 1),
        lambda acc, h: (acc * FP_MULT + h) % FP_MOD,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


@register(
    "q_text_tfidf",
    oracle=f"""
    WITH tokens AS (
        SELECT doc_id, UNNEST({_WORDS_SQL}) AS token FROM documents
    ), tf AS (
        SELECT doc_id, token, COUNT(*) AS tc FROM tokens GROUP BY doc_id, token
    ), doclen AS (
        SELECT doc_id, COUNT(*) AS dl FROM tokens GROUP BY doc_id
    ), df AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY token
    ), n AS (
        SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tokens
    ), scored AS (
        SELECT tf.doc_id, tf.token,
               (CAST(tf.tc AS DOUBLE) / doclen.dl)
                 * (CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf
        FROM tf
        JOIN doclen ON tf.doc_id = doclen.doc_id
        JOIN df     ON tf.token  = df.token
        CROSS JOIN n
    )
    SELECT doc_id, token AS top_token, tfidf
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, token) AS rn
        FROM scored
    ) t WHERE rn = 1
    """,
    doc="TF-IDF top term per document (linear idf = N/df, not log — "
    "cross-engine libm log differs in the last ulp, so the oracle-exact "
    "variant stays in exact divisions; the ranking is idf-monotone "
    "regardless). Term/doc frequencies via two shuffles; the global N is a "
    "broadcast scalar.",
    tags=("text",),
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    tokens = d.select("doc_id", F.explode(_words()).alias("token"))
    tf = tokens.groupBy("doc_id", "token").agg(F.count("*").alias("tc"))
    doclen = tokens.groupBy("doc_id").agg(F.count("*").alias("dl"))
    df = tokens.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = tokens.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(doclen, "doc_id")
        .join(df, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            ((F.col("tc").cast("double") / F.col("dl")) * (F.col("n_docs").cast("double") / F.col("df"))).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("token").alias("top_token"), "tfidf")
    )


#: intra-document repetition gate (the Gopher/C4-style quality rule:
#: documents dominated by repeated n-grams are boilerplate/spam)
REP_NGRAM_WORDS = 3
REP_MAX_DUP_RATIO = 0.1


@register(
    "q_text_repetition",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, {_WORDS_SQL} AS ws FROM documents
    ), grams AS (
        SELECT doc_id,
               UNNEST(list_transform(
                   range(1, len(ws) - {REP_NGRAM_WORDS - 2}),
                   i -> array_to_string(ws[i:i+{REP_NGRAM_WORDS - 1}], ' '))) AS gram
        FROM w WHERE len(ws) >= {REP_NGRAM_WORDS}
    ), cnt AS (
        SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY doc_id, gram
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_ngrams,
           CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS n_dup_ngrams,
           CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS DOUBLE) / SUM(c) AS dup_ratio,
           CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS DOUBLE) / SUM(c)
               <= {REP_MAX_DUP_RATIO} AS keep
    FROM cnt GROUP BY doc_id
    """,
    doc=f"Intra-document repetition scoring: the fraction of {REP_NGRAM_WORDS}-gram "
    "occurrences belonging to a gram repeated within the SAME document "
    "(non-distinct grams, unlike the dedup shingles) — the standard "
    "boilerplate/spam quality gate for training corpora. Pipeline: "
    "explode grams -> count per (doc, gram) -> per-doc totals; both "
    "shuffles are keyed by doc_id(+gram), so the corpus streams through "
    "narrowly and no stage sees more than one document's gram multiset. "
    "The ratio is an exact int/int -> double division (bit-identical "
    "cross-engine); keep gate at dup_ratio <= "
    f"{REP_MAX_DUP_RATIO} is non-vacuous on the fixture (max ~0.14).",
    tags=("text",),
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ws = _words()
    grams = F.transform(
        F.sequence(F.lit(1), F.size("ws") - (REP_NGRAM_WORDS - 1)),
        lambda i: F.concat_ws(" ", F.slice(F.col("ws"), i, REP_NGRAM_WORDS)),
    )
    cnt = (
        d.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= REP_NGRAM_WORDS)
        .select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
    )
    dup = F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0)))
    per = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_ngrams"), dup.alias("n_dup_ngrams")
    )
    ratio = F.col("n_dup_ngrams").cast("double") / F.col("n_ngrams")
    return per.select(
        "doc_id",
        "n_ngrams",
        "n_dup_ngrams",
        ratio.alias("dup_ratio"),
        (ratio <= REP_MAX_DUP_RATIO).alias("keep"),
    )


#: Canonical text normalization: lowercase -> strip non-alphanumerics ->
#: collapse whitespace -> trim. The fixture corpus is already in the
#: normal form, so planted noisy variants (uppercased, punctuated,
#: extra-whitespace clones) make the normalize-then-dedup non-vacuous.
NORM_OFFSET = 4_000_000
NORM_PLANT_MOD = 100
NORM_PLANT_K = 3

_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), "
    "' +', ' ', 'g'))"
)


@register(
    "q_text_normalize",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {NORM_OFFSET}, '  ' || upper(text) || '!! '
        FROM documents WHERE doc_id % {NORM_PLANT_MOD} < {NORM_PLANT_K}
    ), n AS (
        SELECT doc_id, md5({_NORM_SQL}) AS norm_fp,
               CAST(length({_NORM_SQL}) AS BIGINT) AS norm_len
        FROM corpus
    )
    SELECT doc_id, norm_fp, norm_len,
           ROW_NUMBER() OVER (PARTITION BY norm_fp ORDER BY doc_id) = 1
               AS is_canonical,
           CAST(COUNT(*) OVER (PARTITION BY norm_fp) AS BIGINT) AS n_variants
    FROM n
    """,
    doc="Unicode-lite text normalization + normalized exact dedup: "
    "lowercase, strip non-alphanumerics, collapse whitespace, trim — the "
    "canonicalization every corpus runs before fingerprinting so that "
    "case/punctuation/spacing variants of the same page collapse. Emits "
    "the normalized fingerprint, its length, the min-doc_id canonical "
    "flag, and the variant-group size; planted noisy clones (uppercased + "
    "punctuation + stray spaces) prove the variants actually collapse. "
    "Narrow map + one fingerprint-keyed window — duplicate groups are "
    "tiny, so the partition-by-fp shuffle is skew-free at any scale.",
    tags=("text", "dedup"),
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    plant = d.filter(F.col("doc_id") % NORM_PLANT_MOD < NORM_PLANT_K).select(
        (F.col("doc_id") + NORM_OFFSET).alias("doc_id"),
        F.concat(F.lit("  "), F.upper(F.col("text")), F.lit("!! ")).alias("text"),
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    n = d.unionByName(plant).select(
        "doc_id",
        F.md5(norm).alias("norm_fp"),
        F.length(norm).cast("bigint").alias("norm_len"),
    )
    w = Window.partitionBy("norm_fp")
    return n.select(
        "doc_id",
        "norm_fp",
        "norm_len",
        (F.row_number().over(w.orderBy(F.col("doc_id").asc())) == 1).alias("is_canonical"),
        F.count("*").over(w).cast("bigint").alias("n_variants"),
    )


#: PII patterns — deliberately in the regex subset where Java regex (Spark)
#: and RE2 (DuckDB) agree: literal classes, bounded quantifiers, no
#: backrefs/lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL = r"https?://[^ ]+"
PII_PHONE = r"\d{3}-\d{4}"
#: the fixture corpus contains no PII, so the declared query unions planted
#: rows (same pattern as q_dedup_embedding's clones) to keep the check
#: non-vacuous: counts and the redacted-text fingerprint must both match.
REDACT_PLANT = " contact bob@example.com or https://ex.example.org/p?q=1 call 555-0100"
N_REDACT_PLANTED = 5
REDACT_OFFSET = 2_000_000

_REDACT_SQL_EXPR = (
    "regexp_replace(regexp_replace(regexp_replace(text, "
    f"'{PII_EMAIL}', '<EMAIL>', 'g'), "
    f"'{PII_URL}', '<URL>', 'g'), "
    f"'{PII_PHONE}', '<PHONE>', 'g')"
)


@register(
    "q_text_redact",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {REDACT_OFFSET}, text || ' {REDACT_PLANT.strip()}'
        FROM documents WHERE doc_id < {N_REDACT_PLANTED}
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(text, '{PII_URL}'))   AS INTEGER) AS n_urls,
           CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS INTEGER) AS n_phones,
           md5({_REDACT_SQL_EXPR}) AS redacted_fp
    FROM corpus
    """,
    doc="PII detection + redaction — the scrubbing pass every training "
    "corpus runs before tokenization: count emails/URLs/phone patterns per "
    "document and fingerprint the redacted text (md5 proves the "
    "replacement output byte-identical cross-engine, not just the counts). "
    "Pure narrow map — one pass, no shuffle, trivially 100 TB-safe. "
    "Patterns live in the Java-regex/RE2 common subset; planted rows make "
    "the counts non-zero.",
    tags=("text",),
)
def q_text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    plant = d.filter(F.col("doc_id") < N_REDACT_PLANTED).select(
        (F.col("doc_id") + REDACT_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" " + REDACT_PLANT.strip())).alias("text"),
    )
    corpus = d.unionByName(plant)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
            PII_URL,
            "<URL>",
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return corpus.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL)).cast("int").alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(PII_URL)).cast("int").alias("n_urls"),
        F.regexp_count(F.col("text"), F.lit(PII_PHONE)).cast("int").alias("n_phones"),
        F.md5(redacted).alias("redacted_fp"),
    )


#: Overlapping document chunking for embedding/context windows: fixed
#: word-window with stride overlap — the preprocessing step every
#: retrieval/embedding pipeline runs before vectorizing long documents.
CHUNK_WORDS = 50
CHUNK_STRIDE = 25


@register(
    "q_text_chunk",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ), chunked AS (
        SELECT doc_id, len(ws) AS n_words,
               UNNEST(range(0, CAST(ceil(greatest(len(ws) - {CHUNK_WORDS}, 0)
                                         / {CHUNK_STRIDE}.0) AS BIGINT) + 1))
                   AS chunk_id,
               ws
        FROM w WHERE len(ws) >= 1
    )
    SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
           CAST(chunk_id * {CHUNK_STRIDE} + 1 AS BIGINT) AS start_word,
           CAST(least(chunk_id * {CHUNK_STRIDE} + {CHUNK_WORDS}, n_words)
                AS BIGINT) AS end_word,
           CAST(least(chunk_id * {CHUNK_STRIDE} + {CHUNK_WORDS}, n_words)
                - chunk_id * {CHUNK_STRIDE} AS BIGINT) AS n_tokens,
           md5(array_to_string(
               ws[chunk_id * {CHUNK_STRIDE} + 1 :
                  least(chunk_id * {CHUNK_STRIDE} + {CHUNK_WORDS}, n_words)],
               ' ')) AS chunk_fp
    FROM chunked
    """,
    doc=f"Overlapping document chunking ({CHUNK_WORDS}-word windows, stride "
    f"{CHUNK_STRIDE}) — the context-window preprocessing step for "
    "embedding/retrieval pipelines: every document expands to "
    "ceil(max(n-W,0)/S)+1 chunks with word offsets and an md5 content "
    "fingerprint per chunk (proves the chunk CONTENT is byte-identical "
    "cross-engine, not just the counts). Pure narrow map + explode — no "
    "shuffle at all; chunk count is linear in corpus words, so the op is "
    "embarrassingly parallel at any scale. The final chunk is short "
    "rather than padded; a tail shorter than the stride is absorbed by "
    "the previous window (standard sliding-window semantics).",
    tags=("text",),
)
def q_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    ws = _words()
    docs = d.select("doc_id", ws.alias("ws")).filter(F.size("ws") >= 1)
    n_words = F.size("ws")
    n_extra = F.ceil(
        F.greatest(n_words - CHUNK_WORDS, F.lit(0)) / F.lit(float(CHUNK_STRIDE))
    ).cast("int")
    chunk_ids = F.sequence(F.lit(0), n_extra)
    ex = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.col("ws"),
        F.explode(chunk_ids).alias("chunk_id"),
    )
    start = F.col("chunk_id") * CHUNK_STRIDE + 1
    end = F.least(F.col("chunk_id") * CHUNK_STRIDE + CHUNK_WORDS, F.col("n_words"))
    return ex.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        start.cast("bigint").alias("start_word"),
        end.cast("bigint").alias("end_word"),
        (end - F.col("chunk_id") * CHUNK_STRIDE).cast("bigint").alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.slice(F.col("ws"), start, end - start + 1))).alias(
            "chunk_fp"
        ),
    )


#: lexical-familiarity vocabulary floor: tokens seen in fewer docs are OOV.
FAMILIARITY_MIN_DF = 3


@register(
    "q_text_familiarity",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, UNNEST({_WORDS_SQL}) AS token FROM documents
    ),
    vocab AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df
        FROM tok GROUP BY token
        HAVING COUNT(DISTINCT doc_id) >= {FAMILIARITY_MIN_DF}
    ),
    scored AS (
        SELECT t.doc_id,
               COUNT(*) AS n_tokens,
               COUNT(v.token) AS n_known,
               COALESCE(SUM(v.df), 0) AS df_mass
        FROM tok t LEFT JOIN vocab v ON t.token = v.token
        GROUP BY t.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_tokens - n_known AS BIGINT) AS n_oov,
           CAST(n_known AS DOUBLE) / n_tokens AS known_ratio,
           CAST(df_mass AS DOUBLE) / n_tokens AS avg_token_df
    FROM scored
    """,
    doc="Lexical-familiarity quality score — the integer-exact stand-in "
    "for LM-perplexity filtering (log-prob sums are not bit-reproducible "
    "cross-engine; document-frequency mass is): per doc, the fraction of "
    "tokens in the corpus vocabulary (df >= threshold) and the mean "
    "document-frequency of its tokens. Gibberish and boilerplate-free "
    "spam score low on known_ratio; template text scores anomalously "
    "high on avg_token_df — both standard pre-training corpus signals. "
    "Scale shape: token explode -> one df agg (map-side combined), "
    "vocabulary join back on the token key; at 100 TB the vocabulary is "
    "Zipf-truncated by the df floor, so the join's build side stays "
    "bounded while the probe side streams.",
    tags=("text",),
)
def q_text_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    tok = d.select("doc_id", F.explode(_words()).alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= FAMILIARITY_MIN_DF)
    )
    scored = (
        tok.join(vocab, "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count("df").alias("n_known"),
            F.coalesce(F.sum("df"), F.lit(0)).alias("df_mass"),
        )
    )
    return scored.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        (F.col("n_tokens") - F.col("n_known")).cast("bigint").alias("n_oov"),
        (F.col("n_known").cast("double") / F.col("n_tokens")).alias("known_ratio"),
        (F.col("df_mass").cast("double") / F.col("n_tokens")).alias("avg_token_df"),
    )


@register(
    "q_text_diversity",
    oracle="""
    WITH base AS (
        SELECT doc_id, string_split(text, '') AS cs
        FROM documents WHERE n_chars > 0
    ), per AS (
        SELECT doc_id,
               CAST(len(cs) AS BIGINT) AS n_chars_split,
               CAST(len(list_distinct(cs)) AS BIGINT) AS n_distinct_chars,
               CAST(list_sum(list_transform(list_distinct(cs),
                    c -> CAST(len(list_filter(cs, x -> x = c)) AS BIGINT)
                         * CAST(len(list_filter(cs, x -> x = c)) AS BIGINT))) AS BIGINT)
                 AS collision_num
        FROM base
    )
    SELECT doc_id, n_chars_split, n_distinct_chars, collision_num,
           CAST(collision_num AS DOUBLE)
             / (CAST(n_chars_split AS DOUBLE) * CAST(n_chars_split AS DOUBLE)) AS simpson
    FROM per
    """,
    doc="Character-distribution diversity per document (Simpson index = "
    "collision probability sum((count_c/n)^2) — LOW for natural text, "
    "HIGH for degenerate/repetitive content): the quality gate that "
    "catches single-character floods and base64-ish uniform noise, "
    "complementing q_text_repetition's trigram rule. Shannon entropy is "
    "the textbook form but needs libm log (not bit-reproducible "
    "cross-engine — same reason q_text_tfidf uses linear idf); the "
    "Simpson form is exact integer arithmetic (sum of squared counts "
    "over squared length) with ONE final double division. Computed "
    "fully IN-ROW with higher-order functions (distinct chars -> "
    "occurrence counts -> squared sum), so the corpus is never exploded "
    "into a per-character stream — at 100 TB the explode+regroup "
    "formulation the oracle uses would shuffle every character of the "
    "corpus; this shape shuffles nothing.",
    tags=("text",),
)
def q_text_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # filter first (pushdown), project to the 2 needed columns, then
    # fan_out: the per-char higher-order functions are interpreted (not
    # codegen) and otherwise run on ONE input split (io.fan_out; guide
    # §2.2) — a per-row map, so partitioning cannot change the result
    d = fan_out(
        load(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "text")
    )
    cs = F.split("text", "")
    dist = F.array_distinct(cs)
    counts = F.transform(
        dist, lambda c: F.size(F.filter(cs, lambda x: x == c)).cast("bigint")
    )
    num = F.aggregate(
        F.transform(counts, lambda c: c * c),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    n = F.size(cs).cast("bigint")
    return d.select(
        "doc_id",
        n.alias("n_chars_split"),
        F.size(dist).cast("bigint").alias("n_distinct_chars"),
        num.alias("collision_num"),
        (
            F.col("collision_num").cast("double")
            / (F.col("n_chars_split").cast("double") * F.col("n_chars_split").cast("double"))
        ).alias("simpson"),
    ).select(
        "doc_id", "n_chars_split", "n_distinct_chars", "collision_num", "simpson"
    )


@register(
    "q_source_diversity",
    oracle="""
    WITH counts AS (
        SELECT source, lang, COUNT(*) AS n_i
        FROM documents GROUP BY source, lang
    )
    SELECT source,
           CAST(SUM(n_i) AS BIGINT)            AS n_docs,
           CAST(COUNT(*) AS BIGINT)            AS n_langs,
           1 - CAST(SUM(n_i * n_i) AS DOUBLE)
                 / (CAST(SUM(n_i) AS DOUBLE) * CAST(SUM(n_i) AS DOUBLE))
                                               AS gini_impurity,
           CAST(SUM(n_i) AS DOUBLE) * CAST(SUM(n_i) AS DOUBLE)
                 / CAST(SUM(n_i * n_i) AS DOUBLE)
                                               AS effective_langs
    FROM counts
    GROUP BY source
    """,
    doc="Corpus language-balance profile per source: richness (distinct "
    "languages), Gini impurity 1 - sum(p_i^2), and the effective number "
    "of languages 1/sum(p_i^2) (inverse Simpson index) — the mixture "
    "diagnostics a data-curation team watches before setting q_domain_mix "
    "quotas. Deliberately Gini/Simpson instead of Shannon entropy: these "
    "are RATIONAL in the category counts, so both engines compute them "
    "from exact integer sums with one final division — no transcendental "
    "log whose last ulp differs across libm implementations. At 100 TB: "
    "two nested map-side-combined aggregates over (source, lang) then "
    "source — the second runs over |sources| x |langs| rows.",
    tags=("text", "agg", "stats"),
)
def q_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(F.count("*").alias("n_i"))
    sn = F.sum("n_i").cast("double")
    ssq = F.sum(F.col("n_i") * F.col("n_i")).cast("double")
    return counts.groupBy("source").agg(
        F.sum("n_i").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_langs"),
        (F.lit(1) - ssq / (sn * sn)).alias("gini_impurity"),
        (sn * sn / ssq).alias("effective_langs"),
    )
