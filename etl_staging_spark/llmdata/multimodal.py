"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Full codec libraries are not in this container, so decode runs in two
tiers:

- **Real container-header parse** (:func:`parse_media_header`): pure
  stdlib ``struct`` over the payload's magic bytes — PNG IHDR
  width/height, GIF logical-screen dimensions, canonical WAV fmt/data
  chunks (sample rate, channels, frame count). Real bytes exercise the
  mapInPandas seam end-to-end with zero dependencies.
- **Deterministic stub fallback** (:func:`_fake_decode`, md5-derived
  fake dimensions) for payloads with no recognized magic — e.g. the
  synthetic utf-8 payloads the test corpus uses — so the Arrow
  round-trip stays executable and oracle-checkable everywhere.

What is real and load-bearing throughout:

- the schema convention: ``payload binary`` + typed metadata columns;
- the ``mapInPandas`` plumbing: Arrow-batched, schema-declared,
  partition-preserving — exactly the shape a full decoder (PIL,
  torchaudio, pyav frame sampling) drops into;
- the batch discipline: decode cost is per-row Python, so batches
  arrive as pandas DataFrames and the UDF vectorizes over them.

Swap :func:`_decode_one`'s fallback for a full decoder and nothing
else changes — the header-parse tier demonstrates that seam with real
byte formats (tests/test_llmdata.py builds genuine PNG/GIF/WAV files
from stdlib and round-trips them through `decode_table`).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import py_hash64

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes int, fmt string, width int, height int, n_frames int"
)


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fake multimodal table: utf-8 bytes of the text as the opaque
    payload + modality tag. In production the payload column comes from
    the lakehouse (e.g. image bytes inlined or object-store pointers)."""
    n_bytes = F.octet_length(F.col(text_col))
    fmt = (
        F.when(n_bytes % 3 == 0, F.lit("img"))
        .when(n_bytes % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        fmt.alias("fmt"),
    )


def encode_png(width: int, height: int) -> bytes:
    """A GENUINE minimal PNG from stdlib (zlib + crc32): valid
    signature, IHDR, one zlib-compressed 8-bit-grayscale IDAT, IEND.
    The encoder half of the real-bytes decode seam — what a real image
    encoder would hand the pipeline, at zero dependency cost."""
    import binascii
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", binascii.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(width) for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_wav(rate: int, channels: int, n_frames: int) -> bytes:
    """A GENUINE canonical PCM WAV from stdlib: RIFF/WAVE header with a
    16-byte ``fmt `` chunk, 16-bit samples, silent ``data`` payload —
    the audio twin of :func:`encode_png`."""
    block = channels * 2
    data = bytes(n_frames * block)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack(
            "<IHHIIHH", 16, 1, channels, rate, rate * block, block, 16
        )
        + b"data" + struct.pack("<I", len(data)) + data
    )


def wav_payload_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker building a REAL WAV payload per row with
    header fields that are a pure function of the id (rate = 8000 +
    (id % 8) x 1000, channels = 1 + id % 2, frames = 50 + id % 100) —
    the oracle states the expected decode output directly."""
    for pdf in batches:
        ids = pdf["doc_id"].astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "payload": [
                    encode_wav(
                        8000 + (int(i) % 8) * 1000,
                        1 + int(i) % 2,
                        50 + int(i) % 100,
                    )
                    for i in ids
                ],
                "fmt": ["audio"] * len(ids),
            }
        )


def wav_payload_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """id frame -> (doc_id, payload, fmt) with genuine canonical WAV
    bytes — the audio leg of the real-bytes encode -> scan ->
    header-parse loop."""
    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        wav_payload_batches, schema="doc_id bigint, payload binary, fmt string"
    )


def png_payload_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker building a REAL PNG payload per row with
    dimensions that are a pure function of the id (width = 16 +
    id % 32, height = 16 + (id // 7) % 32) — so a SQL oracle can state
    the expected decode output without replaying zlib."""
    for pdf in batches:
        ids = pdf["doc_id"].astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "payload": [
                    encode_png(16 + int(i) % 32, 16 + (int(i) // 7) % 32)
                    for i in ids
                ],
                "fmt": ["img"] * len(ids),
            }
        )


def png_payload_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """id frame -> (doc_id, payload, fmt) with genuine PNG bytes, via
    the same Arrow seam a real encoder would occupy. Feeds
    :func:`decode_table`'s pass-through branch, closing a real-bytes
    encode -> scan -> header-parse loop with zero codec deps."""
    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        png_payload_batches, schema="doc_id bigint, payload binary, fmt string"
    )


def parse_media_header(payload: bytes) -> tuple[int, int, int] | None:
    """REAL decode of the container header — pure stdlib ``struct``
    over magic bytes, no codec libraries. Returns (width, height,
    n_frames) or None when no container magic matches (the caller
    falls back to the deterministic stub). Strictness is deliberate:
    every branch requires the FULL magic plus the named sub-chunk at
    its canonical offset, so arbitrary text/binary payloads (the
    synthetic test corpus) can never false-positive and perturb the
    certified stub outputs.

    - PNG: 8-byte signature then the IHDR chunk — width/height are
      big-endian uint32 at offsets 16/20 (PNG spec §11.2.2).
    - GIF87a/89a: logical-screen width/height, little-endian uint16
      at offsets 6/8.
    - Canonical WAV (RIFF/WAVE with 16-byte PCM ``fmt `` then
      ``data``): mapped as width=sample rate, height=channels,
      n_frames=data bytes / block align (sample frames)."""
    if (
        payload[:8] == b"\x89PNG\r\n\x1a\n"
        and len(payload) >= 24
        and payload[12:16] == b"IHDR"
    ):
        w, h = struct.unpack(">II", payload[16:24])
        return int(w), int(h), 1
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return int(w), int(h), 1
    if (
        payload[:4] == b"RIFF"
        and len(payload) >= 44
        and payload[8:12] == b"WAVE"
        and payload[12:16] == b"fmt "
        and payload[36:40] == b"data"
    ):
        channels, rate = struct.unpack("<HI", payload[22:28])
        (block_align,) = struct.unpack("<H", payload[32:34])
        (data_size,) = struct.unpack("<I", payload[40:44])
        frames = data_size // block_align if block_align else 0
        return int(rate), int(channels), int(frames)
    return None


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a full decoder, used when no
    container magic matches (`parse_media_header`); raise
    NotImplementedError paths are deliberately avoided so the plumbing
    stays executable in CI."""
    h = py_hash64(payload.decode("utf-8", errors="surrogateescape"))
    width = 64 + h % 1920
    height = 64 + (h // 1920) % 1080
    n_frames = 1 + h % 24
    return width, height, n_frames


def _decode_one(payload: bytes) -> tuple[int, int, int]:
    """Two-tier decode: real header parse when the bytes carry a
    recognized container magic, deterministic stub otherwise. A full
    codec decoder replaces the FALLBACK only — recognized real bytes
    already take the real path."""
    return parse_media_header(payload) or _fake_decode(payload)


def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one pandas DataFrame per Arrow batch in, one
    out. Vectorized over the batch; never row-at-a-time across batches."""
    for pdf in batches:
        decoded = [_decode_one(bytes(p)) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                "fmt": pdf["fmt"],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "n_frames": [d[2] for d in decoded],
            }
        )


def decode_table(df: DataFrame) -> DataFrame:
    """payload table -> decoded metadata table via Arrow-batched
    mapInPandas. Partitioning is preserved; no shuffle. A frame that
    already carries a real ``payload`` binary column (plus ``fmt``) is
    consumed as-is — the production contract, same pass-through rule
    as :func:`feature_table`; a text-only frame goes through
    :func:`with_payload`'s synthetic payloads."""
    src = (
        df.select("doc_id", "payload", "fmt")
        if "payload" in df.columns
        else with_payload(df)
    )
    return src.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = DECODED_SCHEMA + ", out_width int, out_height int"


def resize_batches(target: int):
    """mapInPandas factory: aspect-preserving resize metadata (the real
    implementation would call PIL thumbnail/cv2.resize on the payload;
    the geometry math — the testable part — is real)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scale = (target / pdf[["width", "height"]].max(axis=1)).clip(upper=1.0)
            out = pdf.copy()
            # floor+0.5 == round-half-up, identical in numpy and SQL
            out["out_width"] = (pdf["width"] * scale + 0.5).astype("int64")
            out["out_height"] = (pdf["height"] * scale + 0.5).astype("int64")
            yield out

    return _resize


def resize_table(df: DataFrame, target: int = 512) -> DataFrame:
    """Decoded table -> resize plan: longest side capped at ``target``,
    aspect preserved, never upscaled. Arrow-batched, no shuffle."""
    return decode_table(df).mapInPandas(resize_batches(target), schema=RESIZED_SCHEMA)


FEATURES_SCHEMA = "doc_id bigint, fmt string, embedding array<double>"


def feature_batches(dim: int = 64):
    """mapInPandas factory for the feature-extract step — REAL, not a
    stub: the L1-normalized byte histogram of the payload folded to
    ``dim`` bins (bin b collects bytes with value % dim == b), a
    deterministic content signature of the raw bytes. A model encoder
    (image tower, audio embedder) drops into the same slot unchanged:
    payload bytes in, fixed-dim float vector out, ONE numpy pass per
    Arrow batch (payloads concatenate into one buffer; a row-offset
    bincount computes every row's histogram at once). An empty payload
    yields the zero vector and a NULL payload (NULL text) a NULL
    vector — the two degenerate classes
    `stats.embedding_stats_card` tracks as n_zero / n_null."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = [None if p is None else bytes(p) for p in pdf["payload"]]
            # explicit int64: an empty list would otherwise infer float64
            # and np.repeat can't safely cast float counts (zero-row batch)
            lens = np.array(
                [0 if b is None else len(b) for b in raw], dtype=np.int64
            )
            flat = np.frombuffer(b"".join(b for b in raw if b), dtype=np.uint8)
            # row-offset bincount: byte value folded to dim, shifted by
            # its row's slot, one histogram per row in a single pass
            row_of = np.repeat(np.arange(len(raw)), lens)
            counts = np.bincount(
                row_of * dim + (flat % dim), minlength=len(raw) * dim
            ).reshape(len(raw), dim).astype(np.float64)
            norms = counts / np.where(lens == 0, 1, lens)[:, None]
            vecs = [
                None if b is None else norms[i].tolist()
                for i, b in enumerate(raw)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "fmt": pdf["fmt"],
                    "embedding": vecs,
                }
            )

    return _extract


def feature_table(df: DataFrame, dim: int = 64) -> DataFrame:
    """payload table -> per-doc feature vectors via Arrow-batched
    mapInPandas (partition-preserving, no shuffle). The output matches
    the embeddings-table convention (doc-keyed ``array<double>``), so
    the vectors feed the embedding operators — byte-level near-dup via
    `simsearch.cosine_dup_pairs(..., id_col="doc_id")` /
    `semantic_dup_pairs(..., id_col="doc_id")`, ANN via the
    `lsh_multitable_*`/`ivf_*` paths (same ``id_col`` override), and QA
    via `stats.embedding_stats_card(feats, group_col="fmt")` — the id
    and group columns here are ``doc_id``/``fmt``, not those operators'
    ``vec_id``/``label`` defaults. Completes the multimodal chain the
    module doc promises: decode, feature-extract, resize, frame-sample.

    Input: a frame that already carries a real ``payload`` binary
    column (plus ``fmt``) is consumed as-is — the production contract;
    a text-only frame goes through :func:`with_payload`, which
    synthesizes the fake utf-8 payload this container's tests use. The
    pass-through branch projects to exactly (doc_id, payload, fmt)
    BEFORE the Arrow boundary: a missing fmt fails at plan time with a
    clear AnalysisException instead of a KeyError inside the Python
    worker, and extra columns are never serialized to the workers."""
    src = (
        df.select("doc_id", "payload", "fmt")
        if "payload" in df.columns
        else with_payload(df)
    )
    return src.mapInPandas(feature_batches(dim), schema=FEATURES_SCHEMA)


def usable_features(feats: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """THE degenerate-payload policy, in one place for every consumer
    (`CorpusPipeline.dedup_bytes`, `streaming.multimodal_dedup_stream`,
    and their parity tests): drop NULL vectors (NULL payload — the LSH
    kernels raise on NULL by contract) and ZERO vectors (empty payload
    — a zero norm divide-by-zeros the ANSI-mode cosine verify, and two
    empty payloads are trivially 'identical' in a useless way). Editing
    the policy here keeps the batch rung, the stream, and the tests
    mirrored by construction."""
    c = F.col(vec_col)
    return feats.where(c.isNotNull() & F.exists(c, lambda x: x != 0))


FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_ts_ms bigint, frame_key bigint"


def sample_frames(df: DataFrame, fps_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled frame (frame_idx < n_frames), with a per-frame timestamp and
    a deterministic frame key (doc hash + index — the slot a real
    decoder's frame bytes would fill). JVM-side explode of a sequence —
    the fan-out never touches Python; a real frame extractor would then
    mapInPandas over THESE rows, one decode per row, Arrow-batched."""
    decoded = decode_table(df).where(F.col("fmt") == "video")
    frames = decoded.select(
        "doc_id",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    )
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.col("frame_idx").cast("bigint") * fps_ms).alias("frame_ts_ms"),
        (F.col("doc_id") * 1024 + F.col("frame_idx")).cast("bigint").alias("frame_key"),
    )


def usability_card(
    feats: DataFrame, fmt_col: str = "fmt", vec_col: str = "embedding"
) -> DataFrame:
    """Per-format payload-usability card over a `feature_table` output:
    how much of each modality's corpus actually carries a usable
    feature vector — NULL vectors (NULL payloads) and zero vectors
    (empty payloads) broken out separately, because they need different
    fixes (a NULL payload is an ingest defect, an empty one a producer
    emitting placeholders). This is the go/no-go read BEFORE feeding
    the vectors to the embedding dedup/ANN operators, whose
    `usable_features` gate silently drops exactly these rows — the
    card says how much is being dropped and where. Output: (fmt,
    n_docs, n_null_vec, n_zero_vec, n_usable, usable_rate), rate
    prounded to 6.

    Scale shape: one row-local classification over the Arrow kernel's
    output -> ONE map-side-combinable aggregate on the bounded format
    key. No join, no window; the only Python is the feature kernel
    itself (mapInPandas by design)."""
    from ..numeric import pround

    c = F.col(vec_col)
    nonzero = F.exists(c, lambda x: x != 0)
    d = feats.select(
        F.col(fmt_col).alias("fmt"),
        c.isNull().cast("int").alias("nl"),
        (c.isNotNull() & ~nonzero).cast("int").alias("zz"),
        (c.isNotNull() & nonzero).cast("int").alias("ok"),
    )
    agg = d.groupBy("fmt").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nl").cast("bigint").alias("n_null_vec"),
        F.sum("zz").cast("bigint").alias("n_zero_vec"),
        F.sum("ok").cast("bigint").alias("n_usable"),
    )
    return agg.select(
        "fmt",
        "n_docs",
        "n_null_vec",
        "n_zero_vec",
        "n_usable",
        pround(F.col("n_usable") / F.col("n_docs"), 6).alias("usable_rate"),
    )
