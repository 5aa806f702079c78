"""m04/m06 codec gating: the real decoder runs ONLY under
FLOORIST_REAL_CODECS=1, and any real-path failure (library missing, payload
not an image) falls back to the deterministic fake — so oracle parity holds
under any installed-package set (VERDICT r2 item 4 / ADVICE r2)."""

from __future__ import annotations

import hashlib
import io
import sys
import types

import pytest

from floorist_spark.operators import multimodal as mm

PAYLOAD = b"definitely not an image, just document text bytes"


def expected_fake(payload: bytes) -> tuple[int, int, str]:
    dg = hashlib.md5(payload).hexdigest()
    return int(dg[0:4], 16) % 1920 + 1, int(dg[4:8], 16) % 1080 + 1, "FAKE"


@pytest.fixture
def fake_pil(monkeypatch):
    """Install a stand-in PIL whose Image.open records calls; behavior is
    configured per-test via .mode: 'raise' (undecodable payload) or a
    (w, h) tuple (successful decode)."""
    calls = []
    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")

    class _Img:
        def __init__(self, w, h):
            self.width, self.height, self.mode = w, h, "RGB"

        def thumbnail(self, size):
            self.width, self.height = size

        def save(self, out, format=None):
            out.write(b"png-bytes")

    def _open(fh):
        calls.append(fh)
        if image_mod.behavior == "raise":
            raise OSError("cannot identify image file")  # PIL.UnidentifiedImageError subclasses OSError
        return _Img(*image_mod.behavior)

    image_mod.open = _open
    image_mod.behavior = "raise"
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    return image_mod, calls


def test_flag_off_never_imports_pil(fake_pil):
    image_mod, calls = fake_pil
    assert mm._decode_image(PAYLOAD, real=False) == expected_fake(PAYLOAD)
    assert mm._resize_image(PAYLOAD, real=False)[2] == hashlib.md5(PAYLOAD[:64]).hexdigest()
    assert calls == []  # PIL untouched: installing it cannot change results


def test_flag_on_pil_missing_falls_back(monkeypatch):
    monkeypatch.setitem(sys.modules, "PIL", None)  # import raises ImportError
    assert mm._decode_image(PAYLOAD, real=True) == expected_fake(PAYLOAD)


def test_flag_on_undecodable_payload_falls_back(fake_pil):
    image_mod, calls = fake_pil
    image_mod.behavior = "raise"
    assert mm._decode_image(PAYLOAD, real=True) == expected_fake(PAYLOAD)
    assert mm._resize_image(PAYLOAD, real=True)[2] == hashlib.md5(PAYLOAD[:64]).hexdigest()
    assert len(calls) == 2  # real path attempted, then fell through


def test_flag_on_decodable_payload_uses_real_decoder(fake_pil):
    image_mod, calls = fake_pil
    image_mod.behavior = (640, 480)
    assert mm._decode_image(PAYLOAD, real=True) == (640, 480, "RGB")
    w, h, dg = mm._resize_image(PAYLOAD, real=True)
    assert (w, h) == (640 // mm.THUMB_SCALE, 480 // mm.THUMB_SCALE)
    assert dg == hashlib.md5(b"png-bytes").hexdigest()


def test_use_real_codecs_reads_env(monkeypatch):
    monkeypatch.delenv("FLOORIST_REAL_CODECS", raising=False)
    assert mm._use_real_codecs() is False
    monkeypatch.setenv("FLOORIST_REAL_CODECS", "1")
    assert mm._use_real_codecs() is True
    monkeypatch.setenv("FLOORIST_REAL_CODECS", "0")
    assert mm._use_real_codecs() is False
