"""Deterministic synthetic benchmark corpus.

The qoi-bench image suite is not redistributable here, so the bench uses a
synthetic corpus whose composition mirrors the suite's categories
(SURVEY.md §2.4/§6): icons (small, flat + palette), screenshots (large flat
regions, text-like noise), photos (dense small gradients), and textures
(high-entropy). Content statistics target a similar op mix: runs, LUMA
deltas, index hits, and raw RGB fallbacks.
"""

from __future__ import annotations

import numpy as np


def _icon(rng, size):
    img = np.zeros((size, size, 3), np.int32)
    img[:] = rng.integers(0, 256, 3)
    for _ in range(6):
        x0, y0 = rng.integers(0, size, 2)
        w, h = rng.integers(size // 8, size // 2, 2)
        img[y0 : y0 + h, x0 : x0 + w] = rng.integers(0, 256, 3)
    return img.astype(np.uint8)


def _screenshot(rng, w, h):
    img = np.zeros((h, w, 3), np.int32)
    img[:] = rng.integers(200, 256, 3)
    for _ in range(20):  # window-like blocks
        x0, y0 = rng.integers(0, w), rng.integers(0, h)
        bw, bh = rng.integers(w // 10, w // 2), rng.integers(h // 10, h // 2)
        img[y0 : y0 + bh, x0 : x0 + bw] = rng.integers(0, 256, 3)
    # text-like speckle rows
    for _ in range(h // 8):
        y = rng.integers(0, h)
        mask = rng.random(w) < 0.3
        img[y, mask] = rng.integers(0, 64, 3)
    return img.astype(np.uint8)


def _photo(rng, w, h):
    """Photo-like content: smooth gradients + spatially-correlated grain.

    Tuned so the SQOA rate lands near the reference's photo corpora
    (photo_kodak ~58%, BASELINE.md) — mostly LUMA-codable deltas with
    occasional RGB escapes."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            120 + 80 * np.sin(xx / (40 + rng.integers(1, 40))),
            120 + 80 * np.cos(yy / (30 + rng.integers(1, 40))),
            120 + 80 * np.sin((xx + yy) / (50 + rng.integers(1, 40))),
        ],
        axis=-1,
    )
    # grain: shared luminance noise (LUMA's green delta window is ±32) with
    # small chroma offsets (dr-dg/db-dg windows are only ±8)
    luma = rng.normal(0, 7, (h, w, 1))
    chroma = rng.normal(0, 1.2, (h, w, 3))
    return np.clip(base + luma + chroma, 0, 255).astype(np.uint8)


def _texture(rng, w, h):
    """Game-texture-like: quantized correlated pattern (reference textures
    land near 35% rate, bench10.txt:8)."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = 96 + 64 * np.sin(xx / 3.1) * np.cos(yy / 2.7)
    luma = rng.normal(0, 18, (h, w, 1))
    luma = (luma + np.roll(luma, 1, 1)) / 2
    img = base[..., None] + luma + rng.normal(0, 2, (h, w, 3))
    return (np.clip(img, 0, 255).astype(np.uint8) // 8) * 8


def make_corpus(scale: float = 1.0, seed: int = 0):
    """Returns list of (pixels_flat_u8, width, height, channels)."""
    rng = np.random.default_rng(seed)
    images = []

    def add(img):
        h, w = img.shape[:2]
        images.append((img.reshape(-1).copy(), w, h, img.shape[2]))

    n = max(1, int(8 * scale))
    for _ in range(n):
        add(_icon(rng, 64))
    for _ in range(max(1, int(4 * scale))):
        add(_icon(rng, 512))
    for _ in range(max(1, int(4 * scale))):
        add(_screenshot(rng, 1024, 768))
    for _ in range(max(1, int(6 * scale))):
        add(_photo(rng, 768, 512))
    for _ in range(max(1, int(2 * scale))):
        add(_texture(rng, 512, 512))
    # a few RGBA photos (alpha mostly constant, occasional change)
    for _ in range(max(1, int(2 * scale))):
        img = _photo(rng, 512, 384)
        a = np.full(img.shape[:2] + (1,), 255, np.uint8)
        a[rng.random(img.shape[:2]) < 0.01] = 128
        add(np.concatenate([img, a], axis=-1))
    return images
