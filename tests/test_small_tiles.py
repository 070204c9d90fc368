"""Reduced-tile decode path for small images (icon-class buckets).

Byte buffers below the 32768 front tile run decode_front_compact at
rows = m/128 (32/64/128), and place_emit pads compacted fronts smaller
than one placement window (pallas_engine.place_emit) — without these,
icon-class buckets pay a full 256-row tile of front compute and a full
window of placement for a few KB of real bytes. Every (m_pad, n_max)
combination the batch pipeline can produce for small images is pinned
byte-exact against the native oracle, including the n_max > m_pad shapes
that exposed the clamped-hi emptiness bug (a full placement window at
the compacted array's end must not read as empty).
"""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import os
LEVEL = __LEVEL__
os.environ["SEQOIA_PALLAS_INTERPRET"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from seqoia_tpu import native, spec
from seqoia_tpu.codec import decode_v2

rng = np.random.default_rng(0)
n = 64 * 64
pal = rng.integers(0, 256, (4, 4), dtype=np.uint8)
run4 = np.repeat(pal[rng.integers(0, 4, 64)], 64, axis=0).ravel().astype(
    np.uint8)
g = np.cumsum(rng.integers(-2, 3, (n, 3)), 0)
luma3 = ((100 + g) % 256).astype(np.uint8).ravel()
mono = (np.cumsum(rng.integers(-3, 4, n)) % 256).astype(np.uint8)
mono2 = rng.integers(0, 256, n * 2, dtype=np.uint8)

# regression: small front + MULTI-TILE placement (n_max >> m). The
# reduced-tile fronts provide less entry slack than one max-size
# placement window, and clamping the window start instead of padding
# broke the expand butterfly's tau - j >= 0 invariant: output tile 0
# decoded right, tiles 1+ emitted garbage (found at icon_512 scale on
# real TPU; pallas_engine.place_emit entry_limit).
vpal = rng.integers(0, 6, (64, 4), dtype=np.uint8) * 40
bigrun = np.repeat(vpal, 1024, axis=0).ravel()  # 64k px, tiny stream
s = native.encode(bigrun, 256, 256, 4, 0, 0)
assert len(s) <= 4096
exp, _ = native.decode(s, 0)
buf = np.zeros((1, 4096), np.uint8)
buf[0, : len(s)] = np.frombuffer(s, np.uint8)
out, _ = decode_v2.decode_stream_batched(
    jnp.asarray(buf), jnp.asarray([len(s) - spec.PADDING_SIZE], jnp.int32),
    jnp.asarray([256 * 256], jnp.int32),
    colch=3, compat=False, out_ch=4, n_max=65536, emit="u8",
    src_alpha=True)
got = np.asarray(out).reshape(-1)[: 256 * 256 * 4]
assert np.array_equal(got, exp), "multi-tile placement from small front"

if LEVEL == "quick":
    contents = [("run4", 4, 4, run4), ("mono", 1, 1, mono)]
    combos = [(4096, 4096), (4096, 8192), (8192, 8192)]
    min_checked = 6
else:
    contents = [
        ("run4", 4, 4, run4), ("run4f3", 4, 3, run4), ("luma3", 3, 3, luma3),
        ("mono", 1, 1, mono), ("mono2", 2, 2, mono2),
    ]
    combos = [(4096, 4096), (8192, 4096), (16384, 4096),
              (4096, 8192), (4096, 16384), (8192, 8192)]
    min_checked = 20

checked = 0
for name, ch, oc, pix in contents:
    s = native.encode(pix, 64, 64, ch, 0, 0)
    norm = (1 if ch < 3 else 3) + (1 - (ch & 1))
    exp, _ = (native.decode(s, 0) if oc == norm else native.decode(s, oc))
    for m_pad, n_max in combos:
        if len(s) > m_pad:
            continue
        assert decode_v2._use_pallas_expand(m_pad, n_max), (m_pad, n_max)
        buf = np.zeros((1, m_pad), np.uint8)
        buf[0, : len(s)] = np.frombuffer(s, np.uint8)
        out, _ = decode_v2.decode_stream_batched(
            jnp.asarray(buf),
            jnp.asarray([len(s) - spec.PADDING_SIZE], jnp.int32),
            jnp.asarray([n], jnp.int32),
            colch=1 if ch < 3 else 3, compat=False, out_ch=oc,
            n_max=n_max, emit="u8", src_alpha=(ch in (2, 4)))
        got = np.asarray(out).reshape(-1)[: n * oc]
        assert np.array_equal(got, exp), (name, m_pad, n_max)
        checked += 1
assert checked >= min_checked, checked

# --- encode direction: reduced-tile fused front (pallas_encode) ----------
from seqoia_tpu.codec import encode_v2, encode_jax

enc_checked = 0
enc_contents = contents if LEVEL != "quick" else contents[:2]
enc_pads = (4096, 8192, 16384) if LEVEL != "quick" else (4096, 8192)
for name, ch, _, pix in enc_contents:
    d = spec.SqoaDesc(64, 64, ch, 0, 0)
    oracle = native.encode(pix, 64, 64, ch, 0, 0)
    payload = oracle[len(spec.pack_header(d)):]
    for n_pad in enc_pads:
        assert encode_v2._use_pallas_spread(n_pad, 2048), n_pad
        rgba = np.zeros((1, n_pad), np.int32)
        rgba[0, :n] = encode_jax.normalize_pixels_packed(pix, d)
        cap = spec.cap_bucket(len(oracle) * 5 // 4)
        out, tot = encode_v2.encode_stream_batched(
            jnp.asarray(rgba), jnp.asarray([n], jnp.int32),
            colch=d.col_channels, has_alpha=d.has_alpha, compat=False,
            out_cap=int(cap))
        got = np.asarray(out)[0][: int(tot[0])].tobytes()
        assert got == payload, (name, n_pad)
        enc_checked += 1
print(f"SMALL_TILES_OK {checked}+{enc_checked}")
"""


def _run(level):
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("__LEVEL__", repr(level))],
        capture_output=True, text=True, timeout=1800,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "SMALL_TILES_OK" in r.stdout


def test_small_tile_decode_parity_quick():
    _run("quick")


@pytest.mark.slow
def test_small_tile_decode_parity_full():
    _run("full")
