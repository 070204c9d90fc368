"""Segment-packed decode for icon-class images (decode_stream_packed).

Many small same-size images pack into one (B, M) byte buffer, one image
per power-of-two segment; the fused front restarts its scans at segment
boundaries (token-automaton reset map, injected channel anchor,
segmented pixel-offset prefix) and the placement engine consumes each
row as one pixel stream — amortizing the per-image grid-step cost that
dominates 4 Kpx icons. Every mode (alpha / noalpha / mono 1+2ch),
channel forcing, dummy padding segments, multi-tile rows, and the
foreign-stream row flag are pinned byte-exact against the native
oracle. Runs the Pallas kernels in interpreter mode on CPU (subprocess
so the module-level interpret flags bind before import).
"""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import os
os.environ["SEQOIA_PALLAS_INTERPRET"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from seqoia_tpu import native, spec
from seqoia_tpu.codec import decode_v2

rng = np.random.default_rng(7)
n = 64 * 64  # seg_px: every image decodes to exactly 4096 pixels


def gen(kind, stride):
    # icon-realistic content: run-heavy (non-compat SQOA has no INDEX op,
    # so every color switch costs a full RGB/RGBA/LUMA op — streams must
    # land under the segment size like real icons do)
    if kind == "palette":  # palette colors in short runs -> RGB(A) + RUN
        pal = rng.integers(0, 256, (5, stride), dtype=np.uint8)
        runs = rng.integers(4, 50, 400)
        idx = np.repeat(rng.integers(0, 5, 400), runs)[:n]
        idx = np.pad(idx, (0, n - len(idx)), mode="edge")
        return pal[idx].ravel()
    if kind == "runs":  # long runs incl. BIGRUN chains
        vals = rng.integers(0, 5, (14, stride), dtype=np.uint8) * 40
        reps = rng.integers(100, 700, 14)
        pix = np.repeat(vals, reps, axis=0)[:n]
        if len(pix) < n:
            pix = np.pad(pix, ((0, n - len(pix)), (0, 0)), mode="edge")
        return pix.ravel()
    if kind == "luma":  # piecewise-constant with LUMA-range steps
        steps = rng.integers(2, 8, 1200)
        m = len(steps)
        dg = rng.integers(-16, 16, (m, 1))
        d = np.concatenate([dg + rng.integers(-4, 5, (m, 1))
                            for _ in range(stride)], axis=1)
        if stride in (2, 4):
            d[:, -1] = rng.integers(-8, 8, m)
        lev = np.cumsum(d, 0) + 120
        pix = np.repeat(lev, steps, axis=0)[:n]
        pix = np.pad(pix, ((0, n - len(pix)), (0, 0)), mode="edge")
        return (pix % 256).astype(np.uint8).ravel()
    if kind == "solid":
        return np.tile(rng.integers(0, 256, stride, dtype=np.uint8), n)
    if kind == "alpha_churn":  # LUMA(+ALPHA modifier) trains
        steps = rng.integers(3, 9, 900)
        m = len(steps)
        d = rng.integers(-6, 7, (m, stride))
        if stride in (2, 4):
            d[:, -1] = rng.integers(-10, 11, m)  # alpha deltas -> ALPHA ops
        lev = np.cumsum(d, 0) + 128
        pix = np.repeat(lev, steps, axis=0)[:n]
        pix = np.pad(pix, ((0, n - len(pix)), (0, 0)), mode="edge")
        return (pix % 256).astype(np.uint8).ravel()
    raise ValueError(kind)


def pack_and_check(images, ch, seg, out_ch, n_rows_hint=None):
    colch = 1 if ch < 3 else 3
    streams = [native.encode(p, 64, 64, ch, 0, 0) for p in images]
    assert all(len(s) <= seg for s in streams), (
        "test content must fit the segment", [len(s) for s in streams])
    k = 32768 // seg  # segments per 32768-byte tile; use 1 tile per row
    b = -(-len(images) // k)
    data = np.zeros((b, k * seg), np.uint8)
    slens = np.zeros((b, k), np.int32)  # dummy segments keep slen 0
    for j, s in enumerate(streams):
        r, c = divmod(j, k)
        data[r, c * seg : c * seg + len(s)] = np.frombuffer(s, np.uint8)
        slens[r, c] = len(s) - spec.PADDING_SIZE
    out, has_ref = decode_v2.decode_stream_packed(
        jnp.asarray(data), jnp.asarray(slens),
        colch=colch, out_ch=out_ch, seg=seg, seg_px=n,
        src_alpha=(ch % 2 == 0),
    )
    assert not np.asarray(has_ref).any()
    ob = np.asarray(out)
    if ob.dtype != np.uint8:
        ob = ob.view(np.uint8)
    ob = ob.reshape(b, -1)
    for j, s in enumerate(streams):
        r, c = divmod(j, k)
        exp, _ = native.decode(s, out_ch)
        got = ob[r, c * n * out_ch : c * n * out_ch + n * out_ch]
        assert np.array_equal(got, exp), (
            f"packed decode mismatch: ch={ch} seg={seg} out_ch={out_ch} "
            f"img={j}")


KINDS = ["palette", "runs", "luma", "solid", "alpha_churn"]

# alpha mode (RGBA icons), 11 images -> dummy-padded second row
pack_and_check([gen(KINDS[i % 5], 4) for i in range(11)], 4, 4096, 4)
# same bucket forced to 3-channel output (drop-alpha interleave)
pack_and_check([gen(KINDS[i % 5], 4) for i in range(5)], 4, 4096, 3)
# noalpha mode (RGB icons), seg 8192, output 3 and forced 4
pack_and_check([gen(KINDS[i % 5], 3) for i in range(9)], 3, 8192, 3)
pack_and_check([gen(KINDS[i % 5], 3) for i in range(3)], 3, 8192, 4)
# mono 1ch and gray+alpha
pack_and_check([gen(KINDS[i % 4], 1) for i in range(10)], 1, 4096, 1)
pack_and_check([gen("alpha_churn", 2) for _ in range(6)], 2, 4096, 2)

# foreign segment: a REF-range byte flags the whole packed ROW, sibling
# rows stay clean
good = [native.encode(gen("palette", 4), 64, 64, 4, 0, 0)
        for _ in range(9)]
hdr = spec.pack_header(spec.SqoaDesc(64, 64, 4, 0, 0))
evil = hdr + bytes([0x20, 0x01]) + spec.PADDING  # REF op
seg = 4096
data = np.zeros((2, 8 * seg), np.uint8)
slens = np.zeros((2, 8), np.int32)
for j, s in enumerate(good[:8]):
    data[0, j * seg : j * seg + len(s)] = np.frombuffer(s, np.uint8)
    slens[0, j] = len(s) - spec.PADDING_SIZE
data[1, : len(evil)] = np.frombuffer(evil, np.uint8)
slens[1, 0] = len(evil) - spec.PADDING_SIZE
data[1, seg : seg + len(good[8])] = np.frombuffer(good[8], np.uint8)
slens[1, 1] = len(good[8]) - spec.PADDING_SIZE
_, has_ref = decode_v2.decode_stream_packed(
    jnp.asarray(data), jnp.asarray(slens),
    colch=3, out_ch=4, seg=seg, seg_px=64 * 64, src_alpha=True)
flags = np.asarray(has_ref)
assert not flags[0] and flags[1], flags

# BatchDecoder integration: an icon bucket on a 1-device mesh rides the
# packed path (stats prove it), results byte-exact incl. the REF row's
# host fallback
from seqoia_tpu.parallel import batch as pbatch
from seqoia_tpu.parallel.mesh import default_mesh

mesh1 = default_mesh(jax.devices()[:1])
icon_streams = good + [evil] + [
    native.encode(gen(k2, 4), 64, 64, 4, 0, 0)
    for k2 in ("runs", "luma", "solid")
]
dec = pbatch.BatchDecoder(mesh1)
res = dec(icon_streams)
assert dec.last_stats.get("packed_rows", 0) >= 1, dec.last_stats
for s, r in zip(icon_streams, res):
    exp, _ = native.decode(s, 0)
    if exp is None:  # the REF row-flag sent it to the host fallback,
        assert r.pixels is None  # which agrees the stream is malformed
    else:
        assert r.pixels is not None and np.array_equal(r.pixels, exp)

print("OK")
"""


@pytest.mark.slow
def test_packed_decode_interpret():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        env=env, capture_output=True, text=True, timeout=3000,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    assert proc.returncode == 0 and "OK" in proc.stdout, (
        proc.stdout[-2000:], proc.stderr[-4000:])
