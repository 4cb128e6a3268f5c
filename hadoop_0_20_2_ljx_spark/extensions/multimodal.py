"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas stages.

No reference counterpart — engine extras. The container has no imaging /
audio libraries, so the DECODE step is stubbed (clearly marked); the
Spark-side plumbing — schema, batch shape, partitioning, UDF signatures —
is real and tested, which is the part that matters for the engine.

Scale notes: binary payloads ride in parquet BinaryType; mapInPandas
streams Arrow batches so a 100 MB image row never materializes the whole
partition; repartition before decode controls per-task memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<n_bytes: long, mime: string, checksum: string>"
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str, media_type: str = "image") -> DataFrame:
    """Build a multimodal frame from a text fixture: payload =
    utf-8 bytes of the text standing in for encoded media, plus typed
    metadata (size / mime / md5 checksum). The schema is the engine's
    multimodal contract (MEDIA_SCHEMA)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit(f"application/x-{media_type}").alias("mime"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


def _decode_real(payload: bytes, media_type: str):
    """The real decoder would dispatch to PIL/librosa/pyav here."""
    raise NotImplementedError(
        "media decode requires imaging/audio libraries not present in this "
        "container; use fake=True for the deterministic stand-in"
    )


def decode_features(df: DataFrame, fake: bool = True, batch_size_hint: int | None = None) -> DataFrame:
    """Decode / feature-extract stage over binary payloads.

    fake=True (default here) computes deterministic stand-in features
    (n_bytes, first_byte, byte_sum over the first 64 bytes) so the
    pipeline shape is testable end-to-end; fake=False raises
    NotImplementedError from the decode stub.

    Output: (doc_id, media_type, n_bytes, first_byte, byte_sum64).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                for _, row in pdf.iterrows():
                    _decode_real(row["payload"], row["media_type"])
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                    "byte_sum64": payloads.map(lambda b: int(sum(b[:64]))),
                }
            )

    src = df.repartition(batch_size_hint) if batch_size_hint else df
    return src.mapInPandas(
        extract,
        schema="doc_id long, media_type string, n_bytes long, first_byte int, byte_sum64 long",
    )


def resize_payload(
    df: DataFrame, target_w: int = 64, target_h: int = 64, fake: bool = True
) -> DataFrame:
    """Resize stage: binary payload in -> binary payload out plus updated
    typed metadata (target dims, new checksum).

    fake=True derives a deterministic stand-in 'resized' payload (a
    truncation/repetition to exactly target_w*target_h bytes) so the
    schema, batch shape and downstream contract are real and testable;
    fake=False raises from the decode stub (no imaging libs here). The
    real implementation swaps ONLY the body of ``shrink`` for a
    PIL/cv2 call — the Spark-side topology is unchanged.
    """
    import hashlib

    n_out = target_w * target_h

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                for _, row in pdf.iterrows():
                    _decode_real(row["payload"], row["media_type"])
            out = []
            for b in pdf["payload"]:
                rep = (bytes(b) * (n_out // max(len(b), 1) + 1))[:n_out]
                out.append(rep)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": out,
                    "width": target_w,
                    "height": target_h,
                    "checksum": [hashlib.md5(p).hexdigest() for p in out],
                }
            )

    return df.mapInPandas(
        shrink,
        schema=(
            "doc_id long, media_type string, payload binary, "
            "width int, height int, checksum string"
        ),
    )


def frame_sample(df: DataFrame, every_n_bytes: int = 16, fake: bool = True) -> DataFrame:
    """Frame-sampling stage shape (video -> every Nth frame): emits one
    row per sampled offset with a per-frame checksum byte. 1->n row
    explosion through mapInPandas, the real streaming-decode topology."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_off, out_val = [], [], []
            for _, row in pdf.iterrows():
                if not fake:
                    _decode_real(row["payload"], row["media_type"])
                b = row["payload"]
                for off in range(0, len(b), every_n_bytes):
                    out_id.append(row["doc_id"])
                    out_off.append(off)
                    out_val.append(b[off])
            yield pd.DataFrame({"doc_id": out_id, "frame_off": out_off, "frame_val": out_val})

    return df.mapInPandas(sample, schema="doc_id long, frame_off long, frame_val int")
