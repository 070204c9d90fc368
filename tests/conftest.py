"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so sharding tests work without
TPU hardware (the driver separately dry-runs the multi-chip path); set before
any jax import.
"""

import os
import subprocess

# The harness environment pins JAX_PLATFORMS=axon (TPU); tests always run on
# the virtual CPU mesh unless explicitly overridden. NB the axon
# sitecustomize re-pins the env var, so jax.config is the reliable switch.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update(
    "jax_platforms", os.environ.get("SEQOIA_TEST_PLATFORM", "cpu")
)

# Persistent compilation cache: the suite's wall time is dominated by XLA
# compilations (one per shape bucket x mode); cache them across runs.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import ctypes

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: large-input stress cases (run by default; deselect "
        "with -m 'not slow' for a quick pass)"
    )

REFERENCE_HEADER = "/root/reference/seqoia.h"
_PROBE_SO = "/tmp/libsqoa_refprobe.so"


def _build_refprobe():
    src = os.path.join(os.path.dirname(__file__), "..", "tools", "refprobe.c")
    cmd = [
        "cc", "-O3", "-std=c11", "-shared", "-fPIC", "-w", "-o", _PROBE_SO,
        f"-DSQOA_REFERENCE_HEADER=\"{REFERENCE_HEADER}\"", src,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


class RefProbe:
    """ctypes wrapper over the upstream reference codec (ground truth)."""

    def __init__(self):
        if not os.path.exists(_PROBE_SO) or os.path.getmtime(
            _PROBE_SO
        ) < os.path.getmtime(
            os.path.join(os.path.dirname(__file__), "..", "tools", "refprobe.c")
        ):
            _build_refprobe()
        lib = ctypes.CDLL(_PROBE_SO)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.ref_encode.restype = ctypes.c_int64
        lib.ref_encode.argtypes = [
            u8p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int64,
        ]
        lib.ref_decode.restype = ctypes.c_int64
        lib.ref_decode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int, u8p, ctypes.c_int64, u32p,
        ]
        self._lib = lib
        self._u8p = u8p
        self._u32p = u32p

    def encode(self, pix, w, h, ch, cs=0, compat=0):
        colch = 1 if ch < 3 else 3
        cap = w * h * (colch + (1 - (ch & 1)) + 1) + 64
        out = np.empty(cap, np.uint8)
        pix = np.ascontiguousarray(pix, dtype=np.uint8).ravel()
        n = self._lib.ref_encode(
            pix.ctypes.data_as(self._u8p), w, h, ch, cs, compat,
            out.ctypes.data_as(self._u8p), cap,
        )
        return out[:n].tobytes() if n >= 0 else None

    def decode(self, data, channels=0):
        buf = np.frombuffer(bytearray(data), np.uint8)
        cap = 64_000_000
        out = np.empty(cap, np.uint8)
        desc = np.zeros(5, np.uint32)
        n = self._lib.ref_decode(
            buf.ctypes.data_as(self._u8p), len(data), channels,
            out.ctypes.data_as(self._u8p), cap,
            desc.ctypes.data_as(self._u32p),
        )
        if n < 0:
            return None, None
        return out[:n].copy(), tuple(int(x) for x in desc)


@pytest.fixture(scope="session")
def refprobe():
    if not os.path.exists(REFERENCE_HEADER):
        pytest.skip("upstream reference not mounted")
    return RefProbe()


def gen_pixels(rng, n, stride, kind):
    """Pixel pattern generators exercising each op family."""
    if kind == "noise":
        return rng.integers(0, 256, n * stride, dtype=np.uint8)
    if kind == "sparse_delta":  # runs + DIFF/LUMA
        base = rng.integers(0, 256, stride, dtype=np.int32)
        d = rng.integers(-2, 3, (n, stride)) * (rng.random((n, 1)) < 0.2)
        return ((base + np.cumsum(d, 0)) % 256).astype(np.uint8).ravel()
    if kind == "long_runs":  # BIGRUN chains
        vals = rng.integers(0, 4, (max(1, n // 300) + 1, stride), dtype=np.uint8)
        reps = rng.integers(1, 700, len(vals))
        pix = np.repeat(vals, reps, axis=0)[:n].ravel()
        if len(pix) < n * stride:
            pix = np.pad(pix, (0, n * stride - len(pix)))
        return pix.astype(np.uint8)
    if kind == "palette":  # INDEX hits
        pal = rng.integers(0, 256, (5, stride), dtype=np.uint8)
        return pal[rng.integers(0, 5, n)].ravel()
    if kind == "luma":  # dense small deltas
        base = rng.integers(0, 256, stride, dtype=np.int32)
        d = rng.integers(-8, 8, (n, stride))
        return ((base + np.cumsum(d, 0)) % 256).astype(np.uint8).ravel()
    if kind == "alpha_churn":
        p = rng.integers(0, 256, (n, stride), dtype=np.uint8)
        if stride in (2, 4):
            p[:, -1] = rng.integers(250, 256, n)
        return p.ravel()
    raise ValueError(kind)


KINDS = ["noise", "sparse_delta", "long_runs", "palette", "luma", "alpha_churn"]


@pytest.fixture
def pixel_kinds():
    return KINDS
