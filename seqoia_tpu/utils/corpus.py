"""Deterministic synthetic benchmark corpus.

The qoi-bench image suite is not redistributable here, so the bench uses a
synthetic corpus whose composition mirrors the suite's categories
(SURVEY.md §2.4/§6) *and* its codec-relevant content statistics. The
mechanisms that make SQOA beat QOI on the real suite (bench10.txt) are
reproduced deliberately:

* transparent-background RGBA imagery (icons, pngimg) with antialiased
  alpha edge ramps — SQOA's 1-byte ALPHA modifier (seqoia.h:119-121)
  beats QOI's 5-byte RGBA op on every alpha step, and BIGRUN (512 vs 62)
  wins on the transparent runs;
* photo grain with decorrelated chroma — on real photos neither QOI's
  DIFF nor INDEX fires, so both codecs emit identical LUMA/RGB streams
  (the reference's photo suites are byte-identical in size);
* screenshots dominated by flat rows (run-length advantage) with
  text-like per-pixel luma speckle.

Measured vs the reference encoder on this corpus: sqoa ≈ 3% smaller than
qoi overall (the real suite: 0.7% smaller, README.md:5-7).
"""

from __future__ import annotations

import numpy as np


def _alpha_shape(rng, size, n_shapes, detail):
    """RGBA transparent-background imagery (icon / pngimg mechanism):
    antialiased alpha ramps + gradient interiors."""
    img = np.zeros((size, size, 4), np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    for _ in range(n_shapes):
        cx, cy = rng.integers(size // 8, size - size // 8, 2)
        r = rng.integers(size // 6, size // 3)
        col = rng.integers(30, 256, 3).astype(np.float32)
        d = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
        a = np.clip((r - d) / max(10.0, r * 0.3), 0, 1)  # alpha edge ramp
        grad = 1 - 0.25 * (yy - (cy - r)) / max(1, 2 * r)
        for c in range(3):
            img[..., c] = np.where(
                a > 0, col[c] * np.clip(grad, 0, 1), img[..., c]
            )
        img[..., 3] = np.maximum(img[..., 3], a * 255)
    if detail:  # glyph-like speckle inside shapes
        mask = (img[..., 3] > 200) & (rng.random((size, size)) < 0.08)
        img[mask, :3] = np.clip(
            img[mask, :3] + rng.normal(0, 12, (mask.sum(), 3)), 0, 255
        )
    return np.clip(img, 0, 255).astype(np.uint8)


def _screenshot(rng, w, h):
    """Flat-row-dominated UI content with per-pixel text speckle."""
    img = np.zeros((h, w, 3), np.float32)
    img[:] = rng.integers(235, 256, 3)
    for _ in range(4):  # window-like blocks
        x0, y0 = rng.integers(0, w), rng.integers(0, h)
        bw, bh = rng.integers(w // 8, w // 3), rng.integers(h // 8, h // 3)
        img[y0 : y0 + bh, x0 : x0 + bw] = rng.integers(190, 256, 3)
    for _ in range(h // 24):  # text-like rows: small per-pixel luma deltas
        y = rng.integers(0, h)
        mask = rng.random(w) < 0.25
        img[y, mask] -= rng.integers(8, 28, (int(mask.sum()), 1))
    return np.clip(img, 0, 255).astype(np.uint8)


def _photo(rng, w, h):
    """Photo-like content: smooth gradients + grain with decorrelated
    chroma, so QOI's DIFF/INDEX almost never fire and both codecs emit
    near-identical LUMA/RGB streams (photo parity, bench10.txt)."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            120 + 80 * np.sin(xx / (40 + rng.integers(1, 40))),
            120 + 80 * np.cos(yy / (30 + rng.integers(1, 40))),
            120 + 80 * np.sin((xx + yy) / (50 + rng.integers(1, 40))),
        ],
        axis=-1,
    )
    luma = rng.normal(0, 5, (h, w, 1))
    chroma = rng.normal(0, 2.0, (h, w, 3))
    return np.clip(base + luma + chroma, 0, 255).astype(np.uint8)


def _texture(rng, w, h):
    """Game-texture-like: smooth periodic pattern + correlated grain."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = 96 + 48 * np.sin(xx / 9.1) * np.cos(yy / 7.3)
    luma = rng.normal(0, 2.5, (h, w, 1))
    luma = (luma + np.roll(luma, 1, 1) + np.roll(luma, 1, 0)) / 3
    img = base[..., None] + luma + rng.normal(0, 1.2, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def make_corpus(scale: float = 1.0, seed: int = 0, labels: bool = False):
    """Returns list of (pixels_flat_u8, width, height, channels) tuples,
    or (pixels, w, h, ch, category) with ``labels=True``. Categories mirror
    the qoi-bench suite's composition (SURVEY.md §2.4/§6)."""
    rng = np.random.default_rng(seed)
    images = []

    def add(img, cat):
        h, w = img.shape[:2]
        images.append((img.reshape(-1).copy(), w, h, img.shape[2], cat))

    for _ in range(max(1, int(8 * scale))):
        add(_alpha_shape(rng, 64, 3, True), "icon_64")
    for _ in range(max(1, int(4 * scale))):
        add(_alpha_shape(rng, 512, 4, False), "icon_512")
    for _ in range(max(1, int(2 * scale))):
        add(_alpha_shape(rng, 1024, 6, True), "pngimg")
    for _ in range(max(1, int(4 * scale))):
        add(_screenshot(rng, 1024, 768), "screenshot")
    for _ in range(max(1, int(6 * scale))):
        add(_photo(rng, 768, 512), "photo")
    # multi-Mpx photos (the reference suite's photo_tecnick/wikipedia class)
    for _ in range(max(1, int(scale / 4))):
        add(_photo(rng, 2048, 1536), "photo_large")
    for _ in range(max(1, int(2 * scale))):
        add(_texture(rng, 512, 512), "texture")
    # RGB photos carrying a mostly-opaque alpha plane
    for _ in range(max(1, int(2 * scale))):
        img = _photo(rng, 512, 384)
        a = np.full(img.shape[:2] + (1,), 255, np.uint8)
        a[rng.random(img.shape[:2]) < 0.01] = 128
        add(np.concatenate([img, a], axis=-1), "photo_rgba")
    if labels:
        return images
    return [t[:4] for t in images]
