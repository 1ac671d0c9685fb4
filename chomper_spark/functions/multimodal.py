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
