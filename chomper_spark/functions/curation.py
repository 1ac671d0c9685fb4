"""Corpus-curation operators — the data-mixing / packing / decontam
steps a large-scale training-data pipeline runs between dedup and
training.  The reference has no analogue (its scope stops at per-row
ETL); these extend SURVEY.md §2.5 as first-class engine capabilities.

All deterministic (md5-derived randomness, fixed ordering) so the
DuckDB oracles reproduce every row bit-exactly — no rand(), no
engine-dependent sampling.

Scale notes:
  * stratified_sample — pure projection + filter: zero shuffles; the
    keep decision is a per-row hash test, so the sample is stable
    under re-partitioning, retries and replays (a training run can
    reproduce its exact input mix).
  * pack_chunks — one shuffle: window per shard (shard = hash(doc_id)
    % n_shards bounds task size), cumulative token sum → sequence id +
    offset.  This is concat-and-chunk packing: documents are laid out
    contiguously per shard and split into budget-sized training
    sequences.
  * decontaminate — shuffles 60-bit shingle HASHES, never shingle
    text; eval-side shingles are tiny (the eval set) so the semi-join
    broadcasts at real scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from chomper_spark.functions.text import hex60_duck, hex60_spark

DEFAULT_SALT = 7
PACK_BUDGET = 64
PACK_SHARDS = 8
DECON_N = 5


# ---------------------------------------------------------- stratified sample


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    default_rate: float = 1.0,
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Deterministic per-stratum sampling (the data-mixing knob: e.g.
    keep 30% of lang='en', 100% of everything else).

    keep ⇔ hex60(md5(salt#doc_id)) / 2^60 < rate[stratum].  Hash-gated,
    not rand()-gated: the decision is a pure function of (doc_id, salt),
    identical on every engine, partition layout and retry."""
    u = F.expr(hex60_spark(f"concat('{salt}#', cast(doc_id AS STRING))")) / F.lit(
        float(2**60)
    )
    rate = F.lit(float(default_rate))
    for k, v in rates.items():
        rate = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(rate)
    return docs.select(
        "doc_id", F.col(strata_col).alias("stratum"), (u < rate).alias("kept")
    )


def stratified_sample_sql(
    rates: dict[str, float],
    strata_col: str = "lang",
    default_rate: float = 1.0,
    salt: int = DEFAULT_SALT,
) -> str:
    keyed = f"concat('{salt}#', cast(doc_id AS VARCHAR))"
    u = f"{hex60_duck(keyed)} / {float(2**60)!r}"
    if rates:
        arms = " ".join(
            f"WHEN {strata_col} = '{str(k).replace(chr(39), chr(39) * 2)}' "
            f"THEN {float(v)!r}"
            for k, v in rates.items()
        )
        rate = f"(CASE {arms} ELSE {float(default_rate)!r} END)"
    else:  # CASE with zero WHEN arms is a parse error — emit the literal
        rate = f"{float(default_rate)!r}"
    return f"""
SELECT doc_id, {strata_col} AS stratum,
       ({u}) < {rate} AS kept
FROM documents
"""


# ------------------------------------------------------------- pack sequences


def pack_chunks(
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    n_shards: int = PACK_SHARDS,
) -> DataFrame:
    """Concat-and-chunk sequence packing: per shard, documents are laid
    end-to-end in doc_id order and cut into ``budget``-token training
    sequences.  Returns (doc_id, shard, seq_in_shard, offset, n_tokens):
    doc starts at ``offset`` tokens into sequence ``seq_in_shard``.

    Sharding bounds the window partition (no global sort); within a
    shard one cumulative sum assigns every doc its position — the
    standard pre-tokenization layout for a packed training corpus."""
    toks = F.size(F.split(F.col("text"), " "))
    # shard from the shared 60-bit md5 hash (DuckDB has no xxhash64);
    # non-negative, so % and pmod agree across engines
    shard = F.pmod(
        F.expr(hex60_spark("cast(doc_id AS STRING)")), F.lit(n_shards)
    ).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = docs.select(
        "doc_id", shard.alias("shard"), toks.alias("n_tokens")
    ).withColumn("_cum_excl", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return staged.select(
        "doc_id",
        "shard",
        F.floor(F.col("_cum_excl") / budget).cast("long").alias("seq_in_shard"),
        (F.col("_cum_excl") % budget).cast("long").alias("offset"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


def pack_chunks_sql(budget: int = PACK_BUDGET, n_shards: int = PACK_SHARDS) -> str:
    return f"""
WITH staged AS (
  SELECT doc_id,
         ({_SHARD_HASH_DUCK} % {n_shards})::INT AS shard,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, shard, n_tokens,
         coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
  FROM staged
)
SELECT doc_id, shard,
       (cum_excl // {budget})::BIGINT AS seq_in_shard,
       (cum_excl % {budget})::BIGINT AS offset,
       n_tokens::BIGINT AS n_tokens
FROM cum
"""


# shared shard hash: 60-bit md5 of the doc id — non-negative, so plain
# % matches Spark's pmod
_SHARD_HASH_DUCK = hex60_duck("cast(doc_id AS VARCHAR)")


# -------------------------------------------------------------- decontaminate


def decontaminate(
    docs: DataFrame,
    eval_mod: int = 97,
    n: int = DECON_N,
) -> DataFrame:
    """Test-set decontamination: flag every training doc sharing any
    ``n``-gram with the held-out eval slice (the classic 13-gram
    overlap rule, shrunk to the test corpus).  Here the eval slice is
    the deterministic subset ``doc_id % eval_mod == 0``; in production
    it is the eval-benchmark corpus.

    Only 60-bit shingle hashes shuffle; the eval shingle set is small →
    broadcast semi-join at scale.  Returns (doc_id, contaminated) for
    every training (non-eval) doc."""
    sh = F.expr(
        f"transform(sequence(1, greatest(size(split(text, ' ')) - {n - 1}, 1)), "
        f"i -> {hex60_spark(f'''concat_ws(' ', slice(split(text, ' '), i, {n}))''')})"
    )
    is_eval = F.col("doc_id") % eval_mod == 0
    # eval side: shingle ONLY the eval slice (the doc_id filter reaches
    # the scan) → distinct hash set, broadcast-sized.
    eval_sh = docs.filter(is_eval).select(F.explode(sh).alias("sh")).distinct()
    # train side: explode → broadcast semi-join, NO corpus-wide distinct
    # first — a (doc_id, shingle) distinct would shuffle every shingle
    # hash of the corpus just to drop per-doc repeats the post-join
    # doc_id distinct absorbs anyway (join fan-out is bounded by doc
    # length, and only matching rows survive the broadcast join).
    train = docs.filter(~is_eval).select("doc_id", F.explode(sh).alias("sh"))
    hits = (
        train.join(F.broadcast(eval_sh), "sh")
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return (
        docs.filter(~is_eval)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select("doc_id", F.coalesce("contaminated", F.lit(False)).alias("contaminated"))
    )


def decontaminate_sql(eval_mod: int = 97, n: int = DECON_N) -> str:
    shingle = hex60_duck(f"array_to_string((string_split(text, ' '))[i:i+{n - 1}], ' ')")
    return f"""
WITH sh AS (
  SELECT DISTINCT doc_id, unnest(list_transform(
    range(1, greatest(len(string_split(text, ' ')) - {n - 1}, 1) + 1),
    i -> {shingle})) AS sh
  FROM documents
),
eval_sh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % {eval_mod} = 0),
hits AS (
  SELECT DISTINCT s.doc_id FROM sh s JOIN eval_sh e ON s.sh = e.sh
  WHERE s.doc_id % {eval_mod} <> 0
)
SELECT d.doc_id, h.doc_id IS NOT NULL AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % {eval_mod} <> 0
"""
