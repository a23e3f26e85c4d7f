"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata, processed through ``mapInPandas``.

The decode/feature-extract steps are STUBBED (no image/audio libs in
this environment — see repo instructions): ``fake_decode`` derives
deterministic pseudo-metadata from the payload bytes so the Spark-side
plumbing — schema, Arrow batch shape, partitioning, UDF signatures —
is real and testable. Swapping ``_decode_stub`` for PIL/librosa is a
one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, n_bytes int"
)
META_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, sha string, "
    "width int, height int, duration_ms int"
)


def synth_media(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Deterministically wrap each document's text bytes as a fake
    media payload with a typed media_type column — the stand-in for a
    real (id, bytes, mime) multimodal table."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.length(payload).alias("n_bytes"),
    )


def _decode_stub(media_type: str, payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: width/height/duration derived from
    the payload digest. Replace with a real decoder in production.

    Raises NotImplementedError for unknown media types — the marker
    that real decoding is intentionally out of scope here.
    """
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for media_type={media_type}")
    d = hashlib.sha256(payload).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    duration = (d[2] << 8 | d[3]) if media_type != "image" else 0
    return width, height, duration


def real_image_decoder():
    """PIL-backed image decode, or None when PIL is not importable.

    Resolved ON THE EXECUTOR (inside the mapInPandas closure), once
    per Python worker, so a cluster where the imaging library is
    installed picks it up with no code change and a cluster without it
    keeps the deterministic stub. A payload PIL cannot open (corrupt
    or mislabeled bytes) yields NULL dimensions instead of failing the
    task — the skip-don't-fail policy the csv parser applies to
    malformed rows (tabular2rdf.py:213-215).
    """
    try:
        import io

        from PIL import Image
    except ImportError:
        return None

    def decode(payload: bytes) -> tuple[int | None, int | None, int | None]:
        try:
            with Image.open(io.BytesIO(payload)) as im:
                return im.width, im.height, 0
        except Exception:
            return None, None, None

    return decode


def _row_decoder(decode: str):
    """The per-row (media_type, payload) -> (w, h, duration_ms)
    dispatch used by extract_media_meta's worker closure."""
    image_real = real_image_decoder() if decode == "auto" else None

    def one(mt: str, payload: bytes):
        if mt == "image" and image_real is not None:
            return image_real(payload)
        return _decode_stub(mt, payload)

    return one


def extract_media_meta(media: DataFrame, decode: str = "auto") -> DataFrame:
    """mapInPandas feature extraction over binary payloads — one Arrow
    batch per call, decode loop in Python, everything else columnar.

    ``decode='auto'`` uses a real decoder for any modality whose
    library imports on the executor (currently PIL for images) and the
    deterministic stub otherwise; ``decode='stub'`` forces the stub
    everywhere (tests and benchmarks, so outputs are identical across
    environments).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        one = _row_decoder(decode)
        for pdf in batches:
            if not len(pdf):
                continue
            metas = [
                one(mt, bytes(p))
                for mt, p in zip(pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "sha": [
                        hashlib.sha256(bytes(p)).hexdigest()
                        for p in pdf["payload"]
                    ],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "duration_ms": [m[2] for m in metas],
                }
            )

    return media.mapInPandas(run, META_SCHEMA)
