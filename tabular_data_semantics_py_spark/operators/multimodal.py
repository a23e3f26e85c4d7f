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
            # pmod, not %: a negative id would make the index 0 (a
            # runtime INVALID_INDEX_OF_ZERO) or negative (silently
            # counts from the END of the array)
            (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
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


RESIZE_SCHEMA = (
    "doc_id long, media_type string, width int, height int, "
    "new_width int, new_height int, resized_sha string"
)


def _fit_dims(width: int, height: int, target: int) -> tuple[int, int]:
    """Thumbnail-fit: scale the longer edge down to ``target``,
    preserving aspect ratio. Pure integer arithmetic (floor), so the
    SQL oracle reproduces it exactly — no IEEE rounding to match."""
    longest = max(width, height)
    if longest <= target:
        return width, height
    # clamp: an extreme aspect ratio (1 x 1000 at target 64) floors
    # the short edge to 0, which is not a valid image dimension — and
    # the real-PIL path would resize to max(n, 1) while the row still
    # reported the 0, so the artifact sha could not be reproduced
    # from the reported dims. Clamp HERE so report and artifact agree.
    return (
        max(width * target // longest, 1),
        max(height * target // longest, 1),
    )


def resize_media(media: DataFrame, target: int = 64,
                 decode: str = "stub") -> DataFrame:
    """mapInPandas resize over binary payloads: decode dims (stub or
    PIL), integer thumbnail-fit to ``target``, emit the resized
    artifact's identity as ``resized_sha``.

    Stub resize output is ``sha256(payload + b"#resize#{w}x{h}")`` —
    deterministic, environment-independent, and exactly recomputable
    by the DuckDB oracle. With ``decode='auto'`` and PIL importable on
    the executor, images take the real ``Image.resize`` path and the
    sha is of the re-encoded PNG bytes (dims from the real decode).
    Per-executor decoder resolution mirrors extract_media_meta.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_real = real_image_decoder() if decode == "auto" else None

        def one(mt: str, payload: bytes):
            if mt == "image" and image_real is not None:
                w, h, _ = image_real(payload)
                if w is None:
                    return None, None, None, None, None
                nw, nh = _fit_dims(w, h, target)
                sha = _real_resize_sha(payload, nw, nh)
                return w, h, nw, nh, sha
            w, h, _ = _decode_stub(mt, payload)
            nw, nh = _fit_dims(w, h, target)
            sha = hashlib.sha256(
                payload + f"#resize#{nw}x{nh}".encode()
            ).hexdigest()
            return w, h, nw, nh, sha

        for pdf in batches:
            if not len(pdf):
                continue
            out = [
                one(mt, bytes(p))
                for mt, p in zip(pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": [o[0] for o in out],
                    "height": [o[1] for o in out],
                    "new_width": [o[2] for o in out],
                    "new_height": [o[3] for o in out],
                    "resized_sha": [o[4] for o in out],
                }
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)


def _real_resize_sha(payload: bytes, nw: int, nh: int) -> str | None:
    """PIL resize + PNG re-encode, sha of the artifact bytes. Only
    called when real_image_decoder() already succeeded on an import,
    so PIL is known importable here."""
    import io

    from PIL import Image

    try:
        with Image.open(io.BytesIO(payload)) as im:
            buf = io.BytesIO()
            im.resize((max(nw, 1), max(nh, 1))).save(buf, format="PNG")
            return hashlib.sha256(buf.getvalue()).hexdigest()
    except Exception:
        return None


FRAME_SCHEMA = (
    "doc_id long, frame_idx int, ts_ms int, frame_sha string"
)


def sample_frames(media: DataFrame, interval_ms: int = 1000,
                  max_frames: int = 8) -> DataFrame:
    """Frame sampling for video payloads: one row per sampled frame at
    ``interval_ms`` spacing, capped at ``max_frames``.

    Two-part plan, each part where it belongs at 100 TB:

    1. Frame-index generation is pure whole-stage codegen — duration
       decoded from the payload digest JVM-side (``sha2`` + hex
       ``conv``, the same bytes the stub decoder uses), then
       ``explode(sequence(0, n_frames-1))``. No Python touches the
       (much larger) post-explode row count until the decode step.
    2. Per-frame extraction is one Arrow-batched mapInPandas over
       (payload, frame_idx): stub "frame" = sha256(payload +
       b"#frame#{idx}") — the seam where a real video decoder
       (payload, ts_ms) -> frame bytes plugs in.

    The explode replicates the payload per frame; that is the real
    shape too (each frame decode needs the container bytes), and the
    cap bounds the fan-out to ``max_frames``x.
    """
    n_frames = F.least(
        F.lit(max_frames),
        (F.col("duration_ms") / interval_ms).cast("int") + 1,
    )
    sha_hex = F.sha2(F.col("payload"), 256)
    duration = (
        F.conv(F.substring(sha_hex, 5, 2), 16, 10).cast("int") * 256
        + F.conv(F.substring(sha_hex, 7, 2), 16, 10).cast("int")
    )
    frames = (
        media.where(F.col("media_type") == "video")
        .withColumn("duration_ms", duration)
        .select(
            "doc_id",
            "payload",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias(
                "frame_idx"
            ),
        )
        .withColumn("ts_ms", F.col("frame_idx") * interval_ms)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "ts_ms": pdf["ts_ms"],
                    "frame_sha": [
                        hashlib.sha256(
                            bytes(p) + f"#frame#{i}".encode()
                        ).hexdigest()
                        for p, i in zip(pdf["payload"], pdf["frame_idx"])
                    ],
                }
            )

    return frames.mapInPandas(run, FRAME_SCHEMA)
