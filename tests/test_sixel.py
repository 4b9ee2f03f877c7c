"""Sixel presentation mode (host/sixel.py + WGIT_SIXEL=1): encoder
roundtrip against a subset decoder (no sixel terminal exists in CI),
palette exactness, RLE correctness, and display integration."""

import io
import os

import numpy as np

from whisper_git_tpu.host.sixel import (
    decode_sixel,
    encode_sixel,
    palette_rgb,
    quantize_332,
)


def _quantized(rgb):
    idx = quantize_332(rgb)
    out = np.zeros_like(rgb)
    for c in np.unique(idx):
        out[idx == c] = palette_rgb(int(c))
    return out


def test_roundtrip_structured_frame():
    rng = np.random.RandomState(3)
    rgb = np.zeros((23, 37, 3), np.uint8)   # non-multiple-of-6 height
    rgb[:8] = (30, 40, 60)
    rgb[8:, :20] = (200, 60, 60)
    rgb[10:14, 25:33] = (60, 200, 120)
    rgb[rng.randint(0, 23, 40), rng.randint(0, 37, 40)] = (255, 255, 0)
    data = encode_sixel(rgb, dither=False)
    assert data.startswith(b"\x1bPq") and data.endswith(b"\x1b\\")
    dec = decode_sixel(data)
    assert dec.shape == rgb.shape
    want = _quantized(rgb)
    # Palette components travel as 0-100 percent: ±3 u8 rounding.
    assert np.abs(dec.astype(int) - want.astype(int)).max() <= 3


def test_roundtrip_random_noise():
    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (12, 64, 3), np.uint8)
    dec = decode_sixel(encode_sixel(rgb, dither=False))
    want = _quantized(rgb)
    assert np.abs(dec.astype(int) - want.astype(int)).max() <= 3


def test_rle_long_runs_compact():
    rgb = np.zeros((6, 500, 3), np.uint8)
    rgb[:] = (10, 200, 10)
    data = encode_sixel(rgb, dither=False)
    # A solid band must RLE to a handful of bytes, not 500 chars.
    assert len(data) < 200, len(data)
    dec = decode_sixel(data)
    assert np.abs(dec.astype(int)
                  - _quantized(rgb).astype(int)).max() <= 3


def test_display_sixel_present(monkeypatch):
    """TermDisplay in sixel mode presents a DCS stream with a cursor
    home, counts the frame as a device present, and skips cell
    diffing."""
    monkeypatch.setenv("WGIT_SIXEL", "1")
    from whisper_git_tpu.host.term_display import TermDisplay

    out = io.StringIO()
    d = TermDisplay((64, 32), out=out)
    assert d.sixel
    frame = np.zeros((32, 64, 4), np.uint8)
    frame[..., 0] = 180
    frame[..., 3] = 255
    d.show(frame)   # no thread: presents synchronously
    s = out.getvalue()
    assert "\x1b[H" in s and "\x1bPq" in s and s.endswith("\x1b\\")
    assert d.device_frames == 1
    # The emitted image decodes to the (possibly resized) frame colors.
    payload = s[s.index("\x1bPq"):].encode("latin-1")
    dec = decode_sixel(payload)
    assert dec[..., 0].max() >= 160 and dec[..., 2].max() <= 3


def test_display_halfblock_default(monkeypatch):
    monkeypatch.delenv("WGIT_SIXEL", raising=False)
    from whisper_git_tpu.host.term_display import TermDisplay

    d = TermDisplay((64, 32), out=io.StringIO())
    assert not d.sixel


def test_dithering_reduces_mean_error_on_gradient():
    x = np.linspace(0, 255, 256, dtype=np.float32)
    rgb = np.zeros((24, 256, 3), np.uint8)
    rgb[..., 2] = x[None, :].astype(np.uint8)      # blue gradient
    rgb[..., 0] = 20
    plain = decode_sixel(encode_sixel(rgb, dither=False))
    dith = decode_sixel(encode_sixel(rgb, dither=True))
    err_plain = np.abs(plain.astype(int) - rgb.astype(int)).mean()
    err_dith = np.abs(dith.astype(int) - rgb.astype(int)).mean()
    # Dithering trades banding for noise: the MEAN error must not get
    # worse, and local 4x4 averages must track the gradient better.
    k = 4
    pa = plain[..., 2].reshape(6, 4, 64, 4).mean(axis=(1, 3))
    da = dith[..., 2].reshape(6, 4, 64, 4).mean(axis=(1, 3))
    ra = rgb[..., 2].reshape(6, 4, 64, 4).mean(axis=(1, 3))
    assert np.abs(da - ra).mean() < np.abs(pa - ra).mean()
    # Per-pixel error rises a little (that IS the dither trade) but
    # must stay the same order — guards a broken threshold matrix.
    assert err_dith <= err_plain * 1.5


def test_display_sixel_degraded_present(monkeypatch):
    """Degraded host frames in sixel mode ship through the sixel pipe
    (cell glyphs would overlay the image) and count as degraded."""
    monkeypatch.setenv("WGIT_SIXEL", "1")
    from whisper_git_tpu.host.term_display import TermDisplay

    out = io.StringIO()
    d = TermDisplay((64, 32), out=out)
    frame = np.zeros((32, 64, 4), np.uint8)
    frame[..., 2] = 200
    frame[..., 3] = 255
    d.show(frame)           # establishes the sixel target size
    # Degraded rasters at HALF the image target (UI-thread budget);
    # the present path integer-upscales back to the image extent.
    assert d.degraded_grid_size() == (16, 32)
    host = np.zeros((16, 32, 3), np.uint8)
    host[..., 1] = 150
    n0 = len(out.getvalue())
    d.present_host_cells(host, chip=" approx ")
    s = out.getvalue()[n0:]
    assert "\x1bPq" in s and "approx" in s
    assert d.degraded_frames == 1 and d.device_frames == 1
