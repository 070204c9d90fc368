"""Adversarial alpha-range streams vs the reference oracle.

The reference decode loop's final dispatch arm is ``else {run = b1 & 0x3f}``
(seqoia.h:773-775): ANY unmatched byte — including an alpha-range byte
fetched as an op — is a run; and the alpha peek (seqoia.h:777-783) consumes
exactly one modifier byte after every op. The fused front-end folds that
peek into the token length (pallas_frontend), so these hand-crafted streams
pin the fold's semantics: standalone alpha ops, alpha trains, modifiers
absorbed by RUN/BIGRUN/LUMA/RGBA ops, and offsets of later ops after
alpha-run tokens.

These streams are never produced by the encoder; they matter for decode
parity on arbitrary input (the format contract, SURVEY.md §2.1).
"""

import numpy as np
import pytest

import seqoia_tpu as sq
from seqoia_tpu import native, spec
from seqoia_tpu.codec import decode_v2

try:  # jax already configured for cpu by conftest
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None


CASES = [
    # (name, op bytes, w, h)
    ("rgba then 4 alphas (mod, op, mod, op)",
     [0xFF, 10, 20, 30, 200, 0x62, 0x68, 0x6A, 0x71], 12, 1),
    ("leading alphas (op absorbs mod)",
     [0x62, 0x68, 0x6A, 0x71], 60, 1),
    ("alpha-run op then rgb (offset shift)",
     [0xFF, 10, 20, 30, 200, 0x62, 0x68, 0xFE, 7, 8, 9], 45, 1),
    ("modifier after RUN op",
     [0xFF, 1, 2, 3, 4, 0x70, 0xC1], 8, 1),
    ("modifier after BIGRUN op",
     [0xFF, 1, 2, 3, 4, 0x70, 0xFD, 0x65], 520, 1),
    ("luma with absorbed modifier",
     [0xFF, 10, 20, 30, 40, 0x85, 0x77, 0x63], 3, 1),
    ("alpha train across many ops",
     [0xFE, 9, 9, 9] + [0x60 + (7 * i) % 32 for i in range(12)], 140, 1),
]


@pytest.mark.parametrize("name,ops,w,h", CASES, ids=[c[0] for c in CASES])
def test_alpha_train_parity(name, ops, w, h):
    ch = 4
    desc = sq.SqoaDesc(w, h, ch, 0, 0)
    stream = spec.pack_header(desc) + bytes(ops) + bytes([0] * 7 + [1])
    exp, _ = native.decode(stream, ch)
    assert exp is not None, f"oracle rejects {name}"
    exp = np.asarray(exp).reshape(-1)

    buf = np.zeros((1, 32768), np.uint8)
    buf[0, : len(stream)] = np.frombuffer(stream, np.uint8)
    out, has_ref = decode_v2.decode_stream_batched(
        jnp.asarray(buf),
        jnp.asarray([len(stream) - spec.PADDING_SIZE], np.int32),
        jnp.asarray([w * h], np.int32),
        colch=3, compat=False, out_ch=ch, n_max=32768, src_alpha=True,
    )
    assert not bool(np.asarray(has_ref)[0])
    got = np.asarray(out)[0, : w * h * ch]
    assert np.array_equal(got, exp), name
