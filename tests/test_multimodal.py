"""Multimodal decode dispatch (operators/multimodal.py): the stub is
the sandbox default, the PIL-backed image decoder activates purely on
import-availability, and corrupt payloads degrade to NULL dims instead
of failing the task."""

import hashlib
import sys
import types

from tabular_data_semantics_py_spark.operators.multimodal import (
    _decode_stub,
    _row_decoder,
    extract_media_meta,
    real_image_decoder,
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
