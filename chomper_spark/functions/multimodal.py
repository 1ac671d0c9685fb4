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


# ------------------------------------------------- real PPM decode + resize
#
# Round 5: the decode step is no longer a stub for UNCOMPRESSED formats
# — P6 PPM (netpbm) parses in pure numpy, so the full decode → pixel
# resize → feature path runs with REAL pixel math inside the existing
# Arrow mapInPandas seam.  Formats needing codecs (JPEG/PNG/audio/
# video) still go through _decode_stub / the fake kernels above.

PPM_W, PPM_H = 16, 12  # synthetic image size; divisible by the out grid


def encode_ppm(pixels) -> bytes:
    """uint8 ndarray (H, W, 3) → binary P6 PPM bytes."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(b: bytes):
    """Binary P6 PPM → uint8 ndarray (H, W, 3).  Pure numpy; handles
    the netpbm header grammar (token whitespace + '#' comments)."""
    import numpy as np

    if b[:2] != b"P6":
        raise ValueError("not a binary P6 PPM")
    # tokenize the header: magic, width, height, maxval — each token
    # may be separated by any whitespace, with #-comments to EOL
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3 and i < len(b):
        c = b[i : i + 1]
        if c == b"#":
            i = b.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(b) and not b[j : j + 1].isspace():
                j += 1
            tokens.append(b[i:j])
            i = j
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    i += 1  # exactly one whitespace byte after maxval, then raster
    raster = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3)


def synthesize_ppm(docs: DataFrame, w: int = PPM_W, h: int = PPM_H) -> DataFrame:
    """Deterministic synthetic camera: one real P6 PPM binary per doc,
    pixel(x, y, c) = (doc_id*7 + (y*w + x)*3 + c) % 256 — closed-form,
    so the DuckDB oracle reproduces every pixel relationally without
    parsing bytes.  (In production the binary column comes off object
    storage; this stage exists so the decoder below chews real bytes.)"""
    import numpy as np

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ramp = np.arange(w * h * 3, dtype=np.int64)
        for pdf in batches:
            content = [
                encode_ppm(((int(d) * 7 + ramp) % 256).astype(np.uint8).reshape(h, w, 3))
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": content})

    return docs.select("doc_id").mapInPandas(_synth, schema="doc_id bigint, content binary")


DECODE_RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, out_w int, out_h int, "
    "mean_r double, mean_g double, mean_b double, r00 double, b_last double"
)


def decode_resize_ppm(
    binary_df: DataFrame, out_w: int = 4, out_h: int = 3
) -> DataFrame:
    """REAL decode → resize: parse each P6 payload, block-average the
    pixel grid down to (out_w, out_h), emit per-channel means of the
    source plus probe values of the resized grid.  All math is exact
    float64 (integer sums), so the relational oracle matches
    bit-for-bit under the stable6 floor.

    One Arrow batch per task; per-row work is the tiny header parse,
    the pixel math is one vectorized reshape-mean over the stacked
    batch (same-size images; variable sizes would group by (w, h))."""
    import numpy as np

    def _stable6(a):
        return np.floor(a * 1e6) / 1e6

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            imgs = np.stack([decode_ppm(bytes(b)) for b in pdf["content"]])
            n, h, w, _ = imgs.shape
            fy, fx = h // out_h, w // out_w
            resized = imgs.reshape(n, out_h, fy, out_w, fx, 3).mean(axis=(2, 4))
            means = imgs.astype(np.float64).reshape(n, h * w, 3).mean(axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": np.full(n, w, dtype=np.int32),
                    "height": np.full(n, h, dtype=np.int32),
                    "out_w": np.full(n, out_w, dtype=np.int32),
                    "out_h": np.full(n, out_h, dtype=np.int32),
                    "mean_r": _stable6(means[:, 0]),
                    "mean_g": _stable6(means[:, 1]),
                    "mean_b": _stable6(means[:, 2]),
                    "r00": _stable6(resized[:, 0, 0, 0]),
                    "b_last": _stable6(resized[:, out_h - 1, out_w - 1, 2]),
                }
            )

    return binary_df.mapInPandas(_decode, schema=DECODE_RESIZE_SCHEMA)


def multimodal_resize(docs: DataFrame, out_w: int = 4, out_h: int = 3) -> DataFrame:
    """Synthesize real PPM binaries → decode → pixel-average resize.
    The byte-slice fake kernel (``resize_media``) remains the path for
    codec-bound formats."""
    return decode_resize_ppm(synthesize_ppm(docs), out_w=out_w, out_h=out_h)


def multimodal_resize_sql(out_w: int = 4, out_h: int = 3) -> str:
    """DuckDB twin: regenerates every pixel from the closed form and
    block-averages relationally — an independent check of the decoded
    raster AND the resize arithmetic."""
    w, h, fx, fy = PPM_W, PPM_H, PPM_W // out_w, PPM_H // out_h
    return f"""
WITH px AS (
  SELECT d.doc_id, x.x, y.y, c.c,
         (d.doc_id * 7 + (y.y * {w} + x.x) * 3 + c.c) % 256 AS v
  FROM documents d
  CROSS JOIN (SELECT unnest(generate_series(0, {w - 1})) AS x) x
  CROSS JOIN (SELECT unnest(generate_series(0, {h - 1})) AS y) y
  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS c) c
),
rs AS (
  SELECT doc_id, x // {fx} AS bx, y // {fy} AS by, c, avg(v) AS rv
  FROM px GROUP BY 1, 2, 3, 4
),
mu AS (
  SELECT doc_id,
         floor(avg(CASE WHEN c = 0 THEN v END) * 1000000.0) / 1000000.0 AS mean_r,
         floor(avg(CASE WHEN c = 1 THEN v END) * 1000000.0) / 1000000.0 AS mean_g,
         floor(avg(CASE WHEN c = 2 THEN v END) * 1000000.0) / 1000000.0 AS mean_b
  FROM px GROUP BY doc_id
)
SELECT m.doc_id, {w}::INT AS width, {h}::INT AS height,
       {out_w}::INT AS out_w, {out_h}::INT AS out_h,
       m.mean_r, m.mean_g, m.mean_b,
       floor(r0.rv * 1000000.0) / 1000000.0 AS r00,
       floor(rl.rv * 1000000.0) / 1000000.0 AS b_last
FROM mu m
JOIN rs r0 ON r0.doc_id = m.doc_id AND r0.bx = 0 AND r0.by = 0 AND r0.c = 0
JOIN rs rl ON rl.doc_id = m.doc_id AND rl.bx = {out_w - 1} AND rl.by = {out_h - 1} AND rl.c = 2
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
