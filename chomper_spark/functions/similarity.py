"""Similarity search over the ``embeddings`` table (array<float> column).

Two paths, as a 100 TB pipeline needs:
  * brute-force cosine top-k — the exactness baseline.  The (small)
    query set is broadcast, so the scan side never shuffles; cosine is
    a codegen'd explicit double sum (no Python, no UDF).
  * LSH-bucketed ANN — the scale path: a deterministic random-
    hyperplane signature buckets vectors; candidates come from an
    equi-join on the bucket id (shuffle on a small int key), cosine is
    verified only within buckets.  Hyperplanes are derived from md5 so
    the DuckDB oracle reproduces the exact same buckets.

Floating-point determinism: every dot product is an EXPLICIT
left-associated sum of float→double products, generated identically
for Spark SQL and DuckDB — bit-identical results, so rank outputs are
hash-stable.  Only integer columns (ids, ranks, buckets) are exported.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window, functions as F

DIM = 64
N_QUERIES = 8
TOP_K = 5
N_PLANES = 4  # 16 buckets
LSH_TOP_K = 3


def _dot_sql(a_elem: str, b_elem: str, dim: int = DIM) -> str:
    """Explicit left-associated sum of products (bit-exact everywhere)."""
    return " + ".join(a_elem.format(d=d) + " * " + b_elem.format(d=d) for d in range(1, dim + 1))


_SP = "CAST(element_at({col}, {{d}}) AS DOUBLE)"
_DK = "{col}[{{d}}]::DOUBLE"


def _cosine_sql(a: str, b: str, elem: str, dim: int = DIM) -> str:
    dot = _dot_sql(elem.format(col=a), elem.format(col=b), dim)
    na = _dot_sql(elem.format(col=a), elem.format(col=a), dim)
    nb = _dot_sql(elem.format(col=b), elem.format(col=b), dim)
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


# ------------------------------------------------------------ brute force


def ann_bruteforce_topk(
    emb: DataFrame, n_queries: int = N_QUERIES, top_k: int = TOP_K, dim: int = DIM
) -> DataFrame:
    """Exact cosine top-k for the first ``n_queries`` vectors vs all.

    Plan shape: broadcast(queries) ⨯ scan(embeddings) → windowed
    row_number per query.  No shuffle of the big side except the final
    per-query topk (k·q rows)."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    n = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb"))
    sim = F.expr(_cosine_sql("q_emb", "n_emb", _SP, dim))
    scored = (
        n.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "rank")
    )


def ann_bruteforce_sql(
    n_queries: int = N_QUERIES, top_k: int = TOP_K, dim: int = DIM
) -> str:
    cos = _cosine_sql("q_emb", "n_emb", _DK, dim)
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < {n_queries}),
n AS (SELECT vec_id AS neighbor_id, embedding AS n_emb FROM embeddings),
s AS (
  SELECT query_id, neighbor_id, {cos} AS sim
  FROM q, n WHERE query_id <> neighbor_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM s)
WHERE rank <= {top_k}
"""


# ------------------------------------------------------- LSH-bucketed ANN


def _planes(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) =
    hex60(md5(f"{p}_{d}")) / 2^59 - 1  ∈ [-1, 1).  Computed in Python
    (hashlib md5 == Spark/DuckDB md5) and embedded as double literals
    in both engines — shortest-roundtrip repr parses identically."""
    out = []
    for p in range(n_planes):
        row = []
        for d in range(1, dim + 1):
            h = int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:15], 16)
            row.append(h / 2**59 - 1.0)
        out.append(row)
    return out


def _sig_sql(elem: str, col: str, n_planes: int = N_PLANES, dim: int = DIM) -> str:
    planes = _planes(n_planes, dim)
    e = elem.format(col=col)
    bits = []
    for p in range(n_planes):
        dot = " + ".join(
            f"{e.format(d=d)} * {planes[p][d - 1]!r}" for d in range(1, dim + 1)
        )
        bits.append(f"(CASE WHEN ({dot}) >= 0.0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def lsh_bucketed_ann(
    emb: DataFrame,
    n_planes: int = N_PLANES,
    top_k: int = LSH_TOP_K,
    dim: int = DIM,
) -> DataFrame:
    """ANN via random-hyperplane buckets: equi-join on the bucket id,
    exact cosine within buckets, top-k per vector.  At 10^10 vectors
    the bucket id is the shuffle key (16–4096 buckets → repartition by
    bucket, each task brute-forces its bucket)."""
    sig = F.expr(_sig_sql(_SP, "embedding", n_planes, dim)).cast("int")
    b = emb.select("vec_id", "embedding", sig.alias("bucket"))
    a_side = b.select(
        F.col("vec_id"), F.col("embedding").alias("a_emb"), "bucket"
    )
    b_side = b.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb"), "bucket"
    )
    sim = F.expr(_cosine_sql("a_emb", "n_emb", _SP, dim))
    scored = (
        a_side.join(b_side, "bucket")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "bucket", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("vec_id", "bucket", "neighbor_id", "rank")
    )


def lsh_bucketed_ann_sql(
    n_planes: int = N_PLANES, top_k: int = LSH_TOP_K, dim: int = DIM
) -> str:
    sig = _sig_sql(_DK, "embedding", n_planes, dim)
    cos = _cosine_sql("a_emb", "n_emb", _DK, dim)
    return f"""
WITH b AS (SELECT vec_id, embedding, {sig}::INT AS bucket FROM embeddings),
s AS (
  SELECT a.vec_id, a.bucket, b.vec_id AS neighbor_id,
         {cos.replace('a_emb', 'a.embedding').replace('n_emb', 'b.embedding')} AS sim
  FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
)
SELECT vec_id, bucket, neighbor_id, rank FROM (
  SELECT vec_id, bucket, neighbor_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM s)
WHERE rank <= {top_k}
"""


# ------------------------------------------------- embedding near-dup pairs


def embedding_neardup_pairs(
    emb: DataFrame, threshold: float = 0.4, n_planes: int = N_PLANES, dim: int = DIM
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket candidates →
    exact cosine ≥ threshold.  Integer-only output (ids); the rounded
    similarity is exported at 6 decimals (bit-exact arithmetic)."""
    sig = F.expr(_sig_sql(_SP, "embedding", n_planes, dim)).cast("int")
    b = emb.select("vec_id", "embedding", sig.alias("bucket"))
    a_side = b.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("a_emb"), "bucket")
    b_side = b.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("n_emb"), "bucket")
    sim = F.expr(_cosine_sql("a_emb", "n_emb", _SP, dim))
    return (
        a_side.join(b_side, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(sim, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def embedding_neardup_sql(
    threshold: float = 0.4, n_planes: int = N_PLANES, dim: int = DIM
) -> str:
    sig = _sig_sql(_DK, "embedding", n_planes, dim)
    cos = _cosine_sql("a_emb", "n_emb", _DK, dim).replace("a_emb", "a.embedding").replace(
        "n_emb", "b.embedding"
    )
    return f"""
WITH b AS (SELECT vec_id, embedding, {sig}::INT AS bucket FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round({cos}, 6) AS cosine
FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round({cos}, 6) >= {threshold}
"""
