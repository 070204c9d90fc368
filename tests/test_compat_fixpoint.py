"""Compat fixpoint failure path: a deep INDEX-dependency chain must exceed
the iteration cap, flag non-convergence, and fall back to the host decoder
through the batch pipeline (byte-exact end to end).

Chain construction (reference semantics: seqoia.h:753-787): color A hashes
to slot 0 — the same slot the fixpoint's zero-initialized wrong guesses
hash to (QOI_COLOR_HASH(0,0,0,0) = 0, seqoia.h:414-417). The pixel stream
alternates A with unique filler colors, so every repeat of A is an INDEX op
whose slot was last written by the *previous* INDEX-decoded A — and because
the wrong guesses collide into slot 0, the optimistic fixpoint
(codec/decode_compat.py) can only extend the correct prefix by one link
per iteration. ~60 links >> _MAX_ITERS=12 guarantees the unconverged path.
"""

import subprocess
import sys

_SCRIPT = r"""
import os
os.environ["SEQOIA_PALLAS_INTERPRET"] = "1"
os.environ["SEQOIA_COMPAT_TPU"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from seqoia_tpu import native, spec
from seqoia_tpu.codec import decode_compat
from seqoia_tpu.parallel import batch

# --- build the deep-chain image -----------------------------------------
# A = (25,0,0,255): 25*3 + 255*11 = 2880 = 45*64 -> hash 0 (slot 0)
A = (25, 0, 0, 255)
assert (A[0]*3 + A[1]*5 + A[2]*7 + A[3]*11) % 64 == 0
pixels = [A]
links = 0
for c in range(2, 64):
    if c == 43:  # 3c = 129 = 1 mod 64 -> (3c+61)%64 == 0: would hit slot 0
        continue
    f = (c, 40, 0, 255)
    assert (f[0]*3 + f[1]*5 + f[2]*7 + f[3]*11) % 64 != 0
    pixels.append(f)
    pixels.append(A)  # INDEX op chained on the previous INDEX-decoded A
    links += 1
assert links > 3 * decode_compat._MAX_ITERS, links
w = len(pixels)
pix = np.array(pixels, np.uint8).reshape(-1)
stream = native.encode(pix, w, 1, 4, 0, 1)
assert stream is not None

# the oracle stream must actually contain INDEX ops (tag byte < 64 in the
# op stream) or the construction is wrong
ops = np.frombuffer(stream[spec.HEADER_SIZE:-spec.PADDING_SIZE], np.uint8)
assert (ops < 64).any()

# --- 1. direct fixpoint call: must flag non-convergence ------------------
m_pad = 32768
buf = np.zeros((1, m_pad), np.uint8)
buf[0, : len(stream)] = np.frombuffer(stream, np.uint8)
out, converged = decode_compat.decode_stream_compat_batched(
    jnp.asarray(buf),
    jnp.asarray([len(stream) - spec.PADDING_SIZE], jnp.int32),
    jnp.asarray([w], jnp.int32),
    colch=3, out_ch=4, n_max=32768,
)
assert not bool(converged[0]), "deep INDEX chain unexpectedly converged"

# --- 2. batch pipeline: unconverged row falls back to host, byte-exact ---
res = batch.BatchDecoder()([stream])
assert res[0].pixels is not None and res[0].error is None
assert np.array_equal(res[0].pixels, pix), "fallback decode mismatch"

# --- 3. control: a shallow-chain stream converges on the same path -------
pix2 = np.array([A, (5, 40, 0, 255), A, (6, 40, 0, 255)], np.uint8).reshape(-1)
s2 = native.encode(pix2, 4, 1, 4, 0, 1)
buf2 = np.zeros((1, m_pad), np.uint8)
buf2[0, : len(s2)] = np.frombuffer(s2, np.uint8)
out2, conv2 = decode_compat.decode_stream_compat_batched(
    jnp.asarray(buf2),
    jnp.asarray([len(s2) - spec.PADDING_SIZE], jnp.int32),
    jnp.asarray([4], jnp.int32),
    colch=3, out_ch=4, n_max=32768,
)
assert bool(conv2[0])
assert np.array_equal(np.asarray(out2)[0, : 4 * 4], pix2)
print("fixpoint failure path OK")
"""


def test_fixpoint_deep_index_chain_falls_back():
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT], capture_output=True, text=True,
        timeout=1200,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "fixpoint failure path OK" in r.stdout
