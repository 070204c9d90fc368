"""Brute-force validation of the TPU scan primitives."""

import numpy as np

import jax.numpy as jnp

from seqoia_tpu.ops import scan_ops


def test_hillis_max():
    rng = np.random.default_rng(0)
    x = rng.integers(-100, 100, (3, 777), dtype=np.int32)
    got = np.asarray(scan_ops.hillis_max(jnp.asarray(x)))
    assert np.array_equal(got, np.maximum.accumulate(x, axis=-1))


def test_hillis_sum_and_blocked_cumsum():
    rng = np.random.default_rng(1)
    for n in (512, 4096, 777):
        x = rng.integers(0, 2000, (2, n), dtype=np.int32)
        ref = np.cumsum(x, axis=-1, dtype=np.int64).astype(np.int32)
        assert np.array_equal(np.asarray(scan_ops.hillis_sum(jnp.asarray(x))), ref)
        assert np.array_equal(
            np.asarray(scan_ops.blocked_cumsum(jnp.asarray(x))), ref
        )


def test_blocked_cumsum_large_totals():
    # totals overflow fp24 in-block exactness boundary checks: keep block
    # sums < 2^24 but cross-block totals large
    x = np.full((1, 8192), 30000, np.int32)
    ref = np.cumsum(x, axis=-1).astype(np.int32)
    got = np.asarray(scan_ops.blocked_cumsum(jnp.asarray(x)))
    assert np.array_equal(got, ref)


def test_fill_forward():
    rng = np.random.default_rng(2)
    n = 501
    vals = rng.integers(0, 1000, (2, n), dtype=np.int32)
    valid = rng.random((2, n)) < 0.1
    got = np.asarray(
        scan_ops.fill_forward(jnp.asarray(vals), jnp.asarray(valid), 7777)
    )
    for b in range(2):
        cur = 7777
        for i in range(n):
            if valid[b, i]:
                cur = vals[b, i]
            assert got[b, i] == cur


def test_tokenizer_states():
    rng = np.random.default_rng(3)
    n = 600
    lens = rng.integers(1, 6, (n,), dtype=np.int32)
    lens[lens == 3] = 1  # lengths in {1,2,4,5} like the codec
    start = 15
    got = np.asarray(scan_ops.tokenizer_states(jnp.asarray(lens), start))
    # sequential reference
    state = 0
    ref = np.zeros(n, np.int32)
    for i in range(n):
        ref[i] = state
        eff = 1 if i < start else int(lens[i])
        state = state - 1 if state > 0 else eff - 1
    assert np.array_equal(got, ref)


def test_segmented_modsum():
    rng = np.random.default_rng(4)
    n = 700
    v0 = rng.integers(0, 256, (n,), dtype=np.int32)
    f0 = rng.random(n) < 0.05
    v1 = rng.integers(0, 256, (n,), dtype=np.int32)
    f1 = rng.random(n) < 0.2
    packed = scan_ops.pack_pair(
        jnp.asarray(v0), jnp.asarray(f0), jnp.asarray(v1), jnp.asarray(f1)
    )
    out = np.asarray(scan_ops.segmented_modsum(packed))
    got0 = out & 255
    got1 = (out >> 16) & 255
    for vals, flags, got in ((v0, f0, got0), (v1, f1, got1)):
        acc = 0
        for i in range(n):
            acc = int(vals[i]) if flags[i] else (acc + int(vals[i])) % 256
            assert got[i] == acc, i
