"""Text analysis over the ``documents`` table — training-data pipeline ops.

The reference's only "function library" is arbitrary Python lambdas fed
to ``Filter`` (chomper/processors.py:251-268, examples/companies.py:20);
at 100 TB those lambdas must become JVM-side Column expressions
(whole-stage codegen, no Python in the hot path).  Everything here is
built from ``pyspark.sql.functions`` only — zero UDFs — and each op has
an ANSI-SQL twin (``*_SQL``) that DuckDB executes verbatim for the
driver's correctness gate.

Cross-engine determinism convention: a 60-bit hash usable in BOTH
engines —
  Spark : CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)
  DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT
(60 bits keeps the value inside signed-int64 range in both.)

Scale notes: every query below is a single narrow projection or one
hash-partitioned aggregation — no joins, no Python; filters/pruning
push to the parquet scan.  At 100 TB these run scan-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# BPE-ish token: a run of alphanumerics, or one non-space symbol.
BPE_TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ["the", "a", "of", "and", "to", "in"]

# language marker table (word-boundary regexes, RE2- and Java-regex safe)
LANG_MARKERS = {
    "en": r"\b(the|and|of|is)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "es": r"\b(el|los|las|es|y)\b",
    "fr": r"\b(le|la|les|et|est)\b",
}
CJK_RE = r"[一-鿿]"


def hex60_spark(expr: str) -> str:
    """Spark SQL text for the shared 60-bit hash of a string expr."""
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def hex60_duck(expr: str) -> str:
    """DuckDB SQL text for the same 60-bit hash."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def stable6(col: F.Column) -> F.Column:
    """6-decimal truncation that is bit-stable across engines.

    ``round(x, 6)`` is NOT: when x·10⁶ lands on a .5 boundary, Spark
    (BigDecimal HALF_UP over the exact binary expansion) and DuckDB
    (scaled-double rounding) can disagree by one ulp — observed on a
    real doc at sf0.001 (0.518688 vs 0.518687).  floor(x·10⁶)/10⁶ has
    no tie to break: both engines do the same IEEE-754 multiply on the
    same double, then floor the identical result."""
    return F.floor(col * F.lit(1e6)) / F.lit(1e6)


def stable6_sql(expr: str) -> str:
    """DuckDB text for the same truncation (see ``stable6``)."""
    return f"floor(({expr}) * 1000000.0) / 1000000.0"


# ---------------------------------------------------------------- token stats


def token_stats(docs: DataFrame) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per document."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens_ws"),
        F.regexp_count(F.col("text"), F.lit(BPE_TOKEN_RE)).alias("n_tokens_bpe"),
        F.length("text").alias("n_chars_obs"),
    )


TOKEN_STATS_SQL = f"""
SELECT doc_id,
       len(string_split(text, ' '))                       AS n_tokens_ws,
       len(regexp_extract_all(text, '{BPE_TOKEN_RE}'))    AS n_tokens_bpe,
       length(text)                                       AS n_chars_obs
FROM documents
"""


# -------------------------------------------------------------- quality score


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic document quality: length, stopword ratio, avg token length.

    All-double arithmetic in a fixed expression order so Spark and the
    DuckDB oracle agree bit-for-bit; the exported score is rounded to 6
    decimals as the stable public value.
    """
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
    avg_len = (F.length("text").cast("double") - (n_tok - F.lit(1.0))) / n_tok
    stop_ratio = n_stop / n_tok
    score = (
        F.lit(0.4) * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.3) * F.least(avg_len / F.lit(8.0), F.lit(1.0))
    )
    return docs.select(
        "doc_id",
        n_tok.cast("int").alias("n_tokens"),
        stable6(stop_ratio).alias("stopword_ratio"),
        stable6(avg_len).alias("avg_token_len"),
        stable6(score).alias("quality_score"),
    )


_STOP_IN = ", ".join(f"'{s}'" for s in STOPWORDS)
QUALITY_SCORE_SQL = f"""
WITH q AS (
  SELECT doc_id,
         len(string_split(text, ' '))::DOUBLE AS n_tok,
         len(list_filter(string_split(text, ' '), t -> t IN ({_STOP_IN})))::DOUBLE AS n_stop,
         length(text)::DOUBLE AS n_chars
  FROM documents
)
SELECT doc_id,
       n_tok::INT AS n_tokens,
       {stable6_sql("n_stop / n_tok")} AS stopword_ratio,
       {stable6_sql("(n_chars - (n_tok - 1.0)) / n_tok")} AS avg_token_len,
       {stable6_sql(
           "0.4 * least(n_tok / 100.0, 1.0) "
           "+ 0.3 * (1.0 - n_stop / n_tok) "
           "+ 0.3 * least(((n_chars - (n_tok - 1.0)) / n_tok) / 8.0, 1.0)"
       )} AS quality_score
FROM q
"""


# ------------------------------------------------------------ language id


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-n-gram language heuristic (CJK chars short-circuit to zh;
    otherwise argmax of per-language stopword-marker hits, fixed
    tie-break order en > de > es > fr, none > 'und' [undetermined])."""
    low = F.lower(F.col("text"))
    scores = {k: F.regexp_count(low, F.lit(v)) for k, v in LANG_MARKERS.items()}
    zh = F.regexp_count(F.col("text"), F.lit(CJK_RE))
    best = F.greatest(*scores.values())
    pred = (
        F.when(zh > 0, F.lit("zh"))
        .when(best == 0, F.lit("und"))
        .when(scores["en"] == best, F.lit("en"))
        .when(scores["de"] == best, F.lit("de"))
        .when(scores["es"] == best, F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return docs.select("doc_id", F.col("lang").alias("lang_tagged"), pred.alias("lang_pred"))


LANG_ID_SQL = f"""
WITH s AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(lower(text), '{LANG_MARKERS["en"]}')) AS s_en,
         len(regexp_extract_all(lower(text), '{LANG_MARKERS["de"]}')) AS s_de,
         len(regexp_extract_all(lower(text), '{LANG_MARKERS["es"]}')) AS s_es,
         len(regexp_extract_all(lower(text), '{LANG_MARKERS["fr"]}')) AS s_fr,
         len(regexp_extract_all(text, '{CJK_RE}')) AS s_zh
  FROM documents
)
SELECT doc_id, lang AS lang_tagged,
       CASE WHEN s_zh > 0 THEN 'zh'
            WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
            WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
            WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
            WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM s
"""


# ------------------------------------------------------------ fingerprinting


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprints: whole-text md5 + winnowing-style rolling
    fingerprint (min 60-bit hash over all 8-char shingles — one pass,
    pure codegen'd array exprs, no explode/shuffle)."""
    win = F.expr(
        "array_min(transform(sequence(1, greatest(length(text) - 7, 1)), "
        f"i -> {hex60_spark('substring(text, i, 8)')}))"
    )
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("fp_md5"),
        win.alias("fp_winnow"),
    )


FINGERPRINT_SQL = f"""
SELECT doc_id,
       md5(text) AS fp_md5,
       list_min(list_transform(range(1, greatest(length(text) - 7, 1) + 1),
                i -> {hex60_duck("substr(text, i, 8)")})) AS fp_winnow
FROM documents
"""


# ------------------------------------------------------------ repetition

REP_NGRAM = 2


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Within-document repetition heuristics (the Gopher-style quality
    rules): fraction of tokens in duplicate 2-grams and the share of
    the single most frequent 2-gram.  Highly repetitive docs (boiler-
    plate, keyword stuffing, degenerate generations) score high and get
    filtered.  One explode + one groupBy per doc — all codegen."""
    bg = F.expr(
        "transform(sequence(1, greatest(size(split(text, ' ')) - 1, 1)), "
        "i -> array_join(slice(split(text, ' '), i, 2), ' '))"
    )
    per_gram = (
        docs.select("doc_id", F.explode(bg).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.sum("c").alias("_n"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("_dup"),
            F.max("c").alias("_top"),
        )
        .select(
            "doc_id",
            stable6(F.col("_dup").cast("double") / F.col("_n").cast("double")).alias(
                "dup_bigram_frac"
            ),
            stable6(F.col("_top").cast("double") / F.col("_n").cast("double")).alias(
                "top_bigram_frac"
            ),
        )
    )


REPETITION_STATS_SQL = f"""
WITH grams AS (
  SELECT doc_id, unnest(list_transform(
    range(1, greatest(len(string_split(text, ' ')) - 1, 1) + 1),
    i -> array_to_string((string_split(text, ' '))[i:i+1], ' '))) AS g
  FROM documents
),
per_gram AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g)
SELECT doc_id,
       {stable6_sql("sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / sum(c)::DOUBLE")} AS dup_bigram_frac,
       {stable6_sql("max(c)::DOUBLE / sum(c)::DOUBLE")} AS top_bigram_frac
FROM per_gram GROUP BY doc_id
"""


# ------------------------------------------------------------ PII redaction

# conservative patterns shared verbatim by Spark (Java regex) and DuckDB
# (RE2): no lookarounds, no backrefs
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE_RE = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"


def redact_pii(docs: DataFrame) -> DataFrame:
    """Scrub obvious PII (emails, NNN-NNN-NNNN phone shapes) before a
    corpus ships to training — plain regexp_replace, fully JVM-side.
    Returns the redacted text plus match counts for audit."""
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        redacted.alias("text_redacted"),
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(PII_PHONE_RE)).alias("n_phones"),
    )


REDACT_PII_SQL = f"""
SELECT doc_id,
       regexp_replace(regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{PII_PHONE_RE}', '<PHONE>', 'g') AS text_redacted,
       len(regexp_extract_all(text, '{PII_EMAIL_RE}'))::INT AS n_emails,
       len(regexp_extract_all(text, '{PII_PHONE_RE}'))::INT AS n_phones
FROM documents
"""
