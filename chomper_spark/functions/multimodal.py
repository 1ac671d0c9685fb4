"""Multimodal column plumbing — image/audio/video as opaque binary.

The container has no image/audio libraries, so the DECODE step is a
clearly-marked stub (``NotImplementedError`` unless ``fake=True``); the
Spark-side plumbing — binary column schema, typed metadata struct,
Arrow-batched ``mapInPandas`` feature extraction, partitioning — is
real and tested.  On a real cluster you swap ``_decode_stub`` for
PIL/ffmpeg and nothing else changes.

Scale notes: binary payloads ride the same parquet scan as the rest of
the row (no side-channel fetch per row); feature extraction is
``mapInPandas`` (one Arrow batch per task, vectorized pandas inside) —
never per-row Python.  Repartition before extraction so batches are
CPU-bound, not one-giant-partition-bound.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MODALITIES = ["image", "audio", "video"]

FEATURE_SCHEMA = (
    "doc_id bigint, modality string, n_bytes int, header_byte int, content_hash string"
)


def attach_binary(docs: DataFrame) -> DataFrame:
    """Simulate a multimodal lake table: text → opaque binary ``content``
    plus a typed metadata struct.  (In production the binary comes off
    object storage; the schema is what matters here.)"""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.element_at(
                F.array(*[F.lit(m) for m in MODALITIES]),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("modality"),
            F.octet_length(F.col("text")).alias("declared_bytes"),
        ).alias("meta"),
    )


def _decode_stub(content: bytes, modality: str, fake: bool):
    """DECODE STUB — image/audio libs are not in this container.

    Real deployment: replace with PIL.Image.open / soundfile / pyav.
    ``fake=True`` returns a deterministic synthetic decode result so the
    downstream plumbing is exercised end-to-end in tests.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires PIL/soundfile/pyav — not available in this "
            "sandbox; pass fake=True for the deterministic test double"
        )
    # deterministic fake: "decoded dimensions" derived from the bytes
    return {"w": len(content) % 640, "h": (content[0] if content else 0) % 480}


def extract_features(binary_df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    Cheap byte-level features are computed vectorized in pandas; the
    decode step goes through ``_decode_stub``.  1 task = 1+ Arrow
    batches; no per-row Python function calls outside the stub.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            content = pdf["content"]
            modality = pdf["meta"].map(lambda m: m["modality"])
            # touch the decode path (stubbed) once per batch per modality
            for m in modality.unique():
                sample = content.iloc[0]
                _decode_stub(bytes(sample), str(m), fake=fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": modality,
                    "n_bytes": content.map(len).astype("int32"),
                    "header_byte": content.map(
                        lambda b: int(b[0]) if len(b) else -1
                    ).astype("int32"),
                    "content_hash": content.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return binary_df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def multimodal_features(docs: DataFrame, fake_decode: bool = True) -> DataFrame:
    """attach_binary → mapInPandas extract, the full plumbing path."""
    return extract_features(attach_binary(docs), fake_decode=fake_decode)


RESIZE_SCHEMA = (
    "doc_id bigint, modality string, out_w int, out_h int, out_bytes int, out_hash string"
)


def resize_media(
    binary_df: DataFrame, out_w: int = 64, out_h: int = 48, fake_decode: bool = True
) -> DataFrame:
    """Resize step (decode → scale → re-encode), Arrow-batched.

    The scale kernel is the stubbed part (PIL.Image.resize / ffmpeg
    scale in production); the Spark-side contract — binary in, binary-
    derived features out, one ``mapInPandas`` pass, batch-shaped —
    is real.  The fake kernel is deterministic: the "resized" payload
    is the first out_w·out_h//16 bytes of the source (so the DuckDB
    oracle reproduces it relationally)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        budget = out_w * out_h // 16
        for pdf in batches:
            content = pdf["content"]
            modality = pdf["meta"].map(lambda m: m["modality"])
            if len(content):
                _decode_stub(bytes(content.iloc[0]), str(modality.iloc[0]), fake=fake_decode)
            resized = content.map(lambda b: bytes(b)[:budget])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": modality,
                    "out_w": out_w,
                    "out_h": out_h,
                    "out_bytes": resized.map(len).astype("int32"),
                    "out_hash": resized.map(lambda b: hashlib.md5(b).hexdigest()),
                }
            )

    return binary_df.mapInPandas(_resize, schema=RESIZE_SCHEMA)


def multimodal_resize(docs: DataFrame, out_w: int = 64, out_h: int = 48) -> DataFrame:
    return resize_media(attach_binary(docs), out_w=out_w, out_h=out_h, fake_decode=True)


def multimodal_resize_sql(out_w: int = 64, out_h: int = 48) -> str:
    budget = out_w * out_h // 16
    return f"""
SELECT doc_id,
       CASE (doc_id % 3)::INT WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
       {out_w}::INT AS out_w, {out_h}::INT AS out_h,
       least(octet_length(encode(text)), {budget})::INT AS out_bytes,
       md5(substr(text, 1, {budget})) AS out_hash
FROM documents
"""


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes int, frame_hash string"


def sample_frames(
    binary_df: DataFrame, every_n: int = 2, fake_decode: bool = True
) -> DataFrame:
    """Frame sampling (video → every Nth frame), Arrow-batched 1→N
    fan-out: each input row yields multiple frame rows — the
    generator-feeder flatMap shape (chomper/importers.py:91-95) in
    ``mapInPandas`` form.

    Fake kernel (deterministic, oracle-reproducible): a clip has
    ``n_bytes % 7 + 1`` frames; frame k's payload is the byte slice
    ``[k*8, k*8+8)`` of the source."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if len(pdf):
                _decode_stub(
                    bytes(pdf["content"].iloc[0]),
                    str(pdf["meta"].iloc[0]["modality"]),
                    fake=fake_decode,
                )
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_hash": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(blob)
                n_frames = len(b) % 7 + 1
                for k in range(0, n_frames, every_n):
                    sl = b[k * 8 : k * 8 + 8]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(k)
                    out["frame_bytes"].append(len(sl))
                    out["frame_hash"].append(hashlib.md5(sl).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_bytes": pd.Series(out["frame_bytes"], dtype="int32"),
                    "frame_hash": pd.Series(out["frame_hash"], dtype="object"),
                }
            )

    return binary_df.mapInPandas(_frames, schema=FRAME_SCHEMA)


def multimodal_frames(docs: DataFrame, every_n: int = 2) -> DataFrame:
    """Video rows only → sampled frames (fan-out)."""
    b = attach_binary(docs).filter(F.col("meta.modality") == "video")
    return sample_frames(b, every_n=every_n, fake_decode=True)


def multimodal_frames_sql(every_n: int = 2) -> str:
    # generate_series mirrors the fan-out; slices are byte-exact on the
    # ASCII test corpus
    return f"""
WITH v AS (
  SELECT doc_id, text, octet_length(encode(text)) % 7 + 1 AS n_frames
  FROM documents WHERE (doc_id % 3)::INT = 2
),
f AS (
  SELECT doc_id, unnest(generate_series(0, n_frames - 1, {every_n})) AS frame_idx, text
  FROM v
)
SELECT doc_id, frame_idx::INT AS frame_idx,
       octet_length(encode(substr(text, frame_idx * 8 + 1, 8)))::INT AS frame_bytes,
       md5(substr(text, frame_idx * 8 + 1, 8)) AS frame_hash
FROM f
"""


# DuckDB oracle for the whole plumbing path: every exported feature is
# byte-deterministic (UTF-8 encode of ASCII text), so the oracle
# recomputes them relationally.
MULTIMODAL_FEATURES_SQL = """
SELECT doc_id,
       CASE (doc_id % 3)::INT WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
       octet_length(encode(text))::INT AS n_bytes,
       CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE -1 END::INT AS header_byte,
       md5(text) AS content_hash
FROM documents
"""
