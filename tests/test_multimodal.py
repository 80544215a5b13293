"""Multimodal decode: import-guarded decoder resolution (real PIL branch
vs deterministic stub), error-in-band, and kernel plumbing."""

from __future__ import annotations

import sys
import types

import pandas as pd
import pytest


def test_decoder_resolves_to_stub_without_pil():
    """This container ships no Pillow, so the guard must pick the stub."""
    from tank_spark.llm import multimodal as mm

    assert "PIL" not in sys.modules or not hasattr(sys.modules["PIL"], "Image")
    assert mm.get_image_decoder() is mm._decode_image_stub


def test_decoder_resolves_to_pil_when_importable(monkeypatch):
    """With an importable PIL the guard picks the real decoder, and the
    real decoder produces the same feature dict shape from PIL's output."""
    from tank_spark.llm import multimodal as mm

    class _FakeImg:
        width, height = 4, 2

        def convert(self, mode):
            assert mode == "L"
            return [[0, 64, 128, 255], [255, 255, 255, 255]]

    fake_image_mod = types.SimpleNamespace(
        open=lambda buf: _FakeImg(),
        Image=_FakeImg,
    )
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

    decode = mm.get_image_decoder()
    assert decode is mm._decode_image_pil
    out = decode(b"01234567")
    assert out["decoded_w"] == 4 and out["decoded_h"] == 2
    assert out["max_byte"] == 255
    assert out["mean_luma"] == pytest.approx((0 + 64 + 128 + 255 * 5) / 8 / 255.0)


def test_pil_branch_bad_bytes_become_valueerror(monkeypatch):
    """PIL raises assorted exception types for undecodable bytes; the
    kernel contract is ValueError (-> decode_error in-band)."""
    from tank_spark.llm import multimodal as mm

    def _boom(buf):
        raise OSError("cannot identify image file")

    fake_image_mod = types.SimpleNamespace(open=_boom)
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

    with pytest.raises(ValueError, match="decode failed"):
        mm._decode_image_pil(b"not an image, definitely")
    with pytest.raises(ValueError, match="corrupt payload"):
        mm._decode_image_pil(b"x")  # short-circuit before PIL


def test_extract_kernel_error_in_band():
    """Corrupt payloads become rows with decode_error set, not task
    failures (dead-letter-in-band, stub branch)."""
    from tank_spark.llm.multimodal import _extract_kernel

    pdf = pd.DataFrame({
        "doc_id": [1, 2],
        "payload": [b"0123456789abcdef", b"x"],  # second is "corrupt"
        "meta": [{"media_type": "image/png"}, {"media_type": "image/png"}],
    })
    out = pd.concat(list(_extract_kernel(iter([pdf]))), ignore_index=True)
    assert out.loc[0, "decode_error"] is None
    assert out.loc[0, "mean_luma"] is not None
    assert out.loc[1, "decode_error"] == "corrupt payload"
    assert pd.isna(out.loc[1, "mean_luma"])  # None -> NaN in a float column
