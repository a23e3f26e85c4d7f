"""Multimodal decode dispatch (operators/multimodal.py): the stub is
the sandbox default, the PIL-backed image decoder activates purely on
import-availability, and corrupt payloads degrade to NULL dims instead
of failing the task."""

import hashlib
import sys
import types

from tabular_data_semantics_py_spark.operators.multimodal import (
    _decode_stub,
    _fit_dims,
    _row_decoder,
    extract_media_meta,
    real_image_decoder,
    resize_media,
    sample_frames,
    synth_media,
)


def _fake_pil(monkeypatch):
    """Install a minimal PIL.Image into sys.modules: open() succeeds
    on payloads starting with b'PNG' (320x200) and raises otherwise."""

    class FakeIm:
        width, height = 320, 200

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    image_mod = types.ModuleType("PIL.Image")

    def fake_open(buf):
        if buf.read().startswith(b"PNG"):
            return FakeIm()
        raise OSError("cannot identify image file")

    image_mod.open = fake_open
    pil = types.ModuleType("PIL")
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)


def test_no_pil_resolves_to_none():
    if "PIL" in sys.modules:  # pragma: no cover
        import pytest

        pytest.skip("real PIL present; sandbox expectation is absent")
    assert real_image_decoder() is None


def test_fake_pil_decodes_and_null_on_corrupt(monkeypatch):
    _fake_pil(monkeypatch)
    dec = real_image_decoder()
    assert dec is not None
    assert dec(b"PNG....") == (320, 200, 0)
    assert dec(b"not an image") == (None, None, None)


def test_row_dispatch_auto_routes_images_only(monkeypatch):
    _fake_pil(monkeypatch)
    one = _row_decoder("auto")
    assert one("image", b"PNG....") == (320, 200, 0)
    # non-image modalities keep the stub even when PIL is importable
    assert one("audio", b"PNG....") == _decode_stub("audio", b"PNG....")


def test_row_dispatch_stub_ignores_available_pil(monkeypatch):
    _fake_pil(monkeypatch)
    one = _row_decoder("stub")
    assert one("image", b"PNG....") == _decode_stub("image", b"PNG....")


def test_extract_media_meta_stub_spark(spark):
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in extract_media_meta(synth_media(docs), decode="stub").collect()
    }
    assert len(rows) == 3
    for doc_id, text in [(1, "alpha"), (2, "beta"), (3, "gamma")]:
        r = rows[doc_id]
        payload = text.encode()
        assert r["sha"] == hashlib.sha256(payload).hexdigest()
        assert (r["width"], r["height"], r["duration_ms"]) == _decode_stub(
            r["media_type"], payload
        )


def test_fit_dims_integer_thumbnail():
    # longer edge scales to target, aspect preserved under floor
    assert _fit_dims(200, 100, 64) == (64, 32)
    assert _fit_dims(100, 200, 64) == (32, 64)
    # already within target: untouched
    assert _fit_dims(64, 64, 64) == (64, 64)
    assert _fit_dims(40, 64, 64) == (40, 64)
    # floor, not round: 150*64//200 = 48
    assert _fit_dims(200, 150, 64) == (64, 48)
    # extreme aspect: the shorter edge floors to 0, which is not a
    # valid image dimension and would desync the reported dims from
    # the real-PIL artifact (which resizes to >= 1px) — clamped to 1
    assert _fit_dims(1000, 1, 64) == (64, 1)
    assert _fit_dims(1, 1000, 64) == (1, 64)


def test_synth_media_negative_ids(spark):
    """media_type rotation is pmod-based: a negative doc_id must pick
    the sign-safe rotation slot, not index 0 (runtime error) or a
    from-the-end element_at."""
    docs = spark.createDataFrame(
        [(-1, "a"), (-2, "b"), (-3, "c"), (0, "d")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.media_type for r in synth_media(docs).collect()}
    assert rows == {-3: "image", -2: "audio", -1: "video", 0: "image"}


def test_resize_media_stub_spark(spark):
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in resize_media(
            synth_media(docs), target=64, decode="stub"
        ).collect()
    }
    assert len(rows) == 3
    for doc_id, text in [(1, "alpha"), (2, "beta"), (3, "gamma")]:
        r = rows[doc_id]
        payload = text.encode()
        w, h, _ = _decode_stub(r["media_type"], payload)
        nw, nh = _fit_dims(w, h, 64)
        assert (r["width"], r["height"]) == (w, h)
        assert (r["new_width"], r["new_height"]) == (nw, nh)
        assert r["resized_sha"] == hashlib.sha256(
            payload + f"#resize#{nw}x{nh}".encode()
        ).hexdigest()


def test_sample_frames_spark(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i} text") for i in range(12)],
        "doc_id long, text string",
    )
    out = sample_frames(
        synth_media(docs), interval_ms=1000, max_frames=4
    ).collect()
    # only video rows (doc_id % 3 == 2) produce frames
    assert {r["doc_id"] % 3 for r in out} == {2}
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, frames in by_doc.items():
        payload = f"doc {doc_id} text".encode()
        _, _, duration = _decode_stub("video", payload)
        expect_n = min(4, duration // 1000 + 1)
        idxs = sorted(f["frame_idx"] for f in frames)
        assert idxs == list(range(expect_n))
        for f in frames:
            assert f["ts_ms"] == f["frame_idx"] * 1000
            assert f["frame_sha"] == hashlib.sha256(
                payload + f"#frame#{f['frame_idx']}".encode()
            ).hexdigest()
