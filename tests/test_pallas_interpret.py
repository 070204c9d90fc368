"""Exercise the TPU Pallas kernels on CPU via the Pallas interpreter.

The fused kernels (tile scans, compaction engine, decode front-end) only
activate on TPU backends; these tests force them through interpret mode so
the CPU suite covers their logic. Interpret mode is slow, so shapes are the
minimum tile size.
"""

import os
import subprocess
import sys

import pytest

# Run in a subprocess so the env flag is set before modules load/trace.
_SCRIPT = r"""
import os
os.environ["SEQOIA_PALLAS_INTERPRET"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import seqoia_tpu as sq
from seqoia_tpu import native
from seqoia_tpu.codec import decode_v2, encode_v2, encode_jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
w, h = 256, 128  # 32768 pixels; stream spans 2 tiles (exercises carries)
luma = np.cumsum(rng.integers(-6, 7, (w * h, 1)), 0)
chroma = rng.integers(-2, 3, (w * h, 3))
pix = ((128 + luma + chroma) % 256).astype(np.uint8)
pix[1000:3000] = pix[1000]  # long run -> BIGRUN + slow-path rows
stream = native.encode(pix.ravel(), w, h, 3, 0, 0)

m_pad = 65536
assert len(stream) <= m_pad, len(stream)
buf = np.zeros((1, m_pad), np.uint8)
buf[0, : len(stream)] = np.frombuffer(stream, np.uint8)
out, has_ref = decode_v2.decode_stream_batched(
    jnp.asarray(buf), jnp.asarray([len(stream) - 8], jnp.int32),
    jnp.asarray([w * h], jnp.int32),
    colch=3, compat=False, out_ch=3, n_max=w * h,
)
got = np.asarray(out[0]).reshape(-1)
assert np.array_equal(got, pix.ravel()), "interpret decode mismatch"
assert not bool(np.asarray(has_ref)[0])

rgba = encode_jax.normalize_pixels_packed(pix.ravel(), sq.SqoaDesc(w, h, 3, 0, 0))
cap = -(-(w * h * 4 + 9) // 2048) * 2048
eo, et = encode_v2.encode_stream_batched(
    jnp.asarray(rgba)[None], jnp.asarray([w * h], jnp.int32),
    colch=3, has_alpha=False, compat=False, out_cap=cap,
)
got = bytes(np.asarray(eo[0])[: int(et[0])])
assert got == stream[15:], "interpret encode mismatch"

# multi-tile alternating runs: exercises the engine's unaligned appends
# across source tiles (regression for the round-1 window-overflow bug)
pix2 = np.zeros((w * h, 3), np.uint8)
pix2[(np.arange(w * h) // 4099) % 2 == 1] = (7, 9, 11)
stream2 = native.encode(pix2.ravel(), w, h, 3, 0, 0)
eo2, et2 = encode_v2.encode_stream_batched(
    jnp.asarray(encode_jax.normalize_pixels_packed(pix2.ravel(), sq.SqoaDesc(w, h, 3, 0, 0)))[None],
    jnp.asarray([w * h], jnp.int32),
    colch=3, has_alpha=False, compat=False, out_cap=cap,
)
assert bytes(np.asarray(eo2[0])[: int(et2[0])]) == stream2[15:], \
    "interpret alternating-run encode mismatch"

# device-side pixel packing (raw stride-1/2/3 bytes -> packed pixels)
from seqoia_tpu.ops import pallas_pack
for ch in (1, 2, 3):
    dsc = sq.SqoaDesc(w, h, ch, 0, 0)
    raw = rng.integers(0, 256, w * h * dsc.norm_channels, dtype=np.uint8)
    wantp = encode_jax.normalize_pixels_packed(raw, dsc)
    gotp = np.asarray(pallas_pack.normalize_pixels_device(raw, dsc))[: w * h]
    assert np.array_equal(gotp, wantp), f"pack stride {ch} mismatch"

# mono encode through the fused front: deltas outside the narrow mono LUMA
# window vg in [-7, 8] (the reference's shared guard sees vg_r = -vg for
# mono, seqoia.h:606-611 — regression for the +-32 misclassification)
pixm = ((128 + np.cumsum(rng.integers(-20, 21, (w * h, 1)), 0)) % 256).astype(np.uint8)
streamm = native.encode(pixm.ravel(), w, h, 1, 0, 0)
capm = -(-(len(streamm) * 5 // 4) // 2048) * 2048
eom, etm = encode_v2.encode_stream_batched(
    jnp.asarray(encode_jax.normalize_pixels_packed(pixm.ravel(), sq.SqoaDesc(w, h, 1, 0, 0)))[None],
    jnp.asarray([w * h], jnp.int32),
    colch=1, has_alpha=False, compat=False, out_cap=int(capm),
)
assert bytes(np.asarray(eom[0])[: int(etm[0])]) == streamm[15:], \
    "interpret mono encode mismatch"

# mono decode through the fused front (mode="mono": LUMA=1/RGB=2/RGBA=3 byte
# grammar, no alpha peek — seqoia.h:740-783): u8 and u16 in-kernel emission
for mch, mout in ((1, 1), (2, 2)):
    pm = np.empty((w * h, mch), np.uint8)
    pm[:, 0] = (128 + np.cumsum(rng.integers(-12, 13, w * h), 0)) % 256
    if mch == 2:
        pm[:, 1] = (200 + np.cumsum(
            rng.integers(-3, 4, w * h) * (rng.random(w * h) < 0.1), 0)) % 256
    pm[5000:9000] = pm[5000]  # long run -> BIGRUN
    sm = native.encode(pm.ravel(), w, h, mch, 0, 0)
    mp = -(-len(sm) // 32768) * 32768
    bufm = np.zeros((1, mp), np.uint8)
    bufm[0, : len(sm)] = np.frombuffer(sm, np.uint8)
    om, _ = native.decode(sm, 0)
    outm, hrm = decode_v2.decode_stream_batched(
        jnp.asarray(bufm), jnp.asarray([len(sm) - 8], jnp.int32),
        jnp.asarray([w * h], jnp.int32),
        colch=1, compat=False, out_ch=mout, n_max=w * h, emit="words")
    gm = np.asarray(outm).view(np.uint8).reshape(-1)[: w * h * mout]
    assert np.array_equal(gm, om), f"interpret mono decode mismatch ch={mch}"
    assert not bool(np.asarray(hrm)[0])

# QOI-compat fixpoint decode (slot last-writer kernel + index resolution)
from seqoia_tpu.codec import decode_compat
pal = rng.integers(0, 256, (5, 4), dtype=np.uint8)
cpix = pal[rng.integers(0, 5, w * h)].ravel()
cstream = native.encode(cpix, w, h, 4, 0, 1)
cbuf = np.zeros((1, 32768 * 2), np.uint8)
assert len(cstream) <= cbuf.shape[1]
cbuf[0, : len(cstream)] = np.frombuffer(cstream, np.uint8)
cout, conv = decode_compat.decode_stream_compat_batched(
    jnp.asarray(cbuf), jnp.asarray([len(cstream) - 8], jnp.int32),
    jnp.asarray([w * h], jnp.int32), colch=3, out_ch=4, n_max=w * h,
)
assert bool(np.asarray(conv)[0]), "compat fixpoint did not converge"
assert np.array_equal(np.asarray(cout[0]).reshape(-1), cpix), \
    "interpret compat decode mismatch"
print("INTERPRET-OK")
"""


@pytest.mark.slow
def test_pallas_kernels_interpret_mode():
    env = dict(os.environ)
    env["SEQOIA_PALLAS_INTERPRET"] = "1"
    env.pop("JAX_PLATFORMS", None)
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT], env=env,
        capture_output=True, text=True, timeout=3000,
    )
    assert "INTERPRET-OK" in res.stdout, res.stdout + res.stderr
