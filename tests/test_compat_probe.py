"""Compat INDEX-chain depth probe (native.compat_probe) and the `auto`
dispatch heuristic built on it.

The TPU fixpoint decoder converges only when INDEX-dependency chains are
shallow (codec/decode_compat.py); the probe predicts that in one cheap
sequential pass so the batch pipeline can route streams to the fixpoint or
the host pool *before* launching (SEQOIA_COMPAT_TPU=auto,
parallel/batch.py::_compat_mode). These tests pin:

  1. probe semantics on crafted streams (deep adversarial chain from
     test_compat_fixpoint, palette collapse, rejection of non-compat and
     mono inputs);
  2. predictor agreement with the *actual* fixpoint convergence across
     content classes spanning shallow and deep chains — including the
     small-palette case whose strict chain depth is in the hundreds but
     which the fixpoint resolves in a handful of iterations (the
     same-value collapse rule);
  3. end-to-end auto dispatch: a mixed batch decodes byte-exactly, with
     the deep stream routed to the host pool and shallow ones to the TPU
     fixpoint.
"""

import subprocess
import sys

import numpy as np

from seqoia_tpu import native


def _deep_chain():
    """61-link INDEX chain through slot 0 (see test_compat_fixpoint.py)."""
    A = (25, 0, 0, 255)
    chain = [A]
    for c in range(2, 64):
        if c == 43:
            continue
        chain.append((c, 40, 0, 255))
        chain.append(A)
    pix = np.array(chain, np.uint8).reshape(-1)
    return pix, native.encode(pix, len(chain), 1, 4, 0, 1)


def test_probe_deep_chain_depth():
    pix, deep = _deep_chain()
    pr = native.compat_probe(deep)
    assert pr is not None
    depth, n_ops, n_index, n_px, strict = pr
    assert n_index == 61
    # every A read chains on the previous INDEX-decoded A through slot 0,
    # where the strict depth applies (wrong guesses clobber slot 0)
    assert depth == 61 and strict == 61
    assert n_px == len(pix) // 4


def test_probe_palette_collapse():
    """Small-palette content: nominal (strict) chains run long, but the
    collapsed predictor stays shallow because recurring colors re-insert
    identical bytes."""
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (3, 3), dtype=np.uint8)
    p = pal[rng.integers(0, 3, 4096)].ravel()
    s = native.encode(p, 64, 64, 3, 0, 1)
    depth, _, n_index, _, strict = native.compat_probe(s)
    assert n_index > 100
    assert strict > 40
    assert depth <= 8


def test_probe_rejects_non_compat_and_mono():
    rng = np.random.default_rng(1)
    p = rng.integers(0, 256, 300, dtype=np.uint8)
    sqoa = native.encode(p, 10, 10, 3, 0, 0)
    assert native.compat_probe(sqoa) is None
    mono = native.encode(p[:100], 10, 10, 1, 0, 0)
    assert native.compat_probe(mono) is None
    assert native.compat_probe(b"") is None
    assert native.compat_probe(sqoa[:10]) is None


def test_probe_index_free_stream_depth_zero():
    rng = np.random.default_rng(2)
    p = rng.integers(0, 256, 900 * 3, dtype=np.uint8)  # noise: no INDEX hits
    s = native.encode(p, 30, 30, 3, 0, 1)
    depth, n_ops, n_index, n_px, strict = native.compat_probe(s)
    if n_index == 0:
        assert depth == 0 and strict == 0
    assert n_px == 900


_AGREEMENT_SCRIPT = r"""
import os
os.environ["SEQOIA_PALLAS_INTERPRET"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from seqoia_tpu import native, spec
from seqoia_tpu.codec import decode_compat

def fixpoint_conv(stream, npx):
    buf = np.zeros((1, 32768), np.uint8)
    buf[0, : len(stream)] = np.frombuffer(stream, np.uint8)
    out, conv = decode_compat.decode_stream_compat_batched(
        jnp.asarray(buf),
        jnp.asarray([len(stream) - spec.PADDING_SIZE], jnp.int32),
        jnp.asarray([npx], jnp.int32), colch=3, out_ch=4, n_max=32768)
    return bool(np.asarray(conv)[0])

rng = np.random.default_rng(3)
miss = []
for kind in range(10):
    if kind < 3:       # smooth luma walks with occasional recurrences
        g = np.cumsum(rng.integers(-2 - kind, 3 + kind, (1500, 3)), 0)
        p = ((90 + g) % 256).astype(np.uint8).ravel()
    elif kind < 6:     # palettes of 3 / 8 / 24 colors
        ncol = [3, 8, 24][kind - 3]
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        p = pal[rng.integers(0, ncol, 1500)].ravel()
    elif kind < 8:     # noise (INDEX-free)
        p = rng.integers(0, 256, 1500 * 3, dtype=np.uint8)
    else:              # plateaus (RUN-heavy)
        v = rng.integers(0, 8, (30, 3), dtype=np.uint8) * 30
        p = np.repeat(v, 50, axis=0).ravel()
    s = native.encode(p, 50, 30, 3, 0, 1)
    depth = native.compat_probe(s)[0]
    pred = depth < decode_compat._MAX_ITERS
    conv = fixpoint_conv(s, 1500)
    if pred != conv:
        miss.append((kind, depth, conv))
assert not miss, f"predictor misses: {miss}"
print("AGREEMENT_OK")
"""


def test_predictor_matches_fixpoint_convergence():
    r = subprocess.run(
        [sys.executable, "-c", _AGREEMENT_SCRIPT],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "AGREEMENT_OK" in r.stdout


_AUTO_SCRIPT = r"""
import os
os.environ["SEQOIA_PALLAS_INTERPRET"] = "1"
os.environ["SEQOIA_COMPAT_TPU"] = "auto"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from seqoia_tpu import native
from seqoia_tpu.parallel import batch

A = (25, 0, 0, 255)
chain = [A]
for c in range(2, 64):
    if c == 43:
        continue
    chain.append((c, 40, 0, 255))
    chain.append(A)
deep_pix = np.array(chain, np.uint8).reshape(-1)
deep = native.encode(deep_pix, len(chain), 1, 4, 0, 1)

streams, pixels = [deep], [deep_pix]
for k in range(3):
    # all-unique colors: INDEX never fires, probe depth is exactly 0
    i = np.arange(64 * 32, dtype=np.int32)
    p = np.stack(
        [i % 256, (i // 256 + 40 * k) % 256, np.full_like(i, 37 + k),
         np.full_like(i, 255)], axis=1
    ).astype(np.uint8).ravel()
    streams.append(native.encode(p, 64, 32, 4, 0, 1))
    pixels.append(p)

from seqoia_tpu.codec import decode_compat
cap = decode_compat._MAX_ITERS
assert native.compat_probe(deep)[0] >= cap
for s in streams[1:]:
    assert native.compat_probe(s)[0] < cap

hosted = []
orig = batch.BatchDecoder._host_pool
def spy(items, channels, results):
    hosted.extend(i for i, _ in items)
    return orig(items, channels, results)
batch.BatchDecoder._host_pool = staticmethod(spy)

res = batch.BatchDecoder()(streams)
for p_exp, r in zip(pixels, res):
    assert r.pixels is not None and np.array_equal(r.pixels, p_exp)
# the deep chain (index 0) went to the host pool; the shallow streams
# stayed on the fixpoint path
assert 0 in hosted, hosted
assert not any(i in hosted for i in (1, 2, 3)), hosted
print("AUTO_OK")
"""


def test_auto_dispatch_routes_by_probe():
    r = subprocess.run(
        [sys.executable, "-c", _AUTO_SCRIPT],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "AUTO_OK" in r.stdout
