"""Host<->device transfer helpers tuned for the axon-tunneled TPU.

Measured on this backend (NOTES_ROUND3.md): H2D runs at ~1.7 GB/s for any
dtype, but D2H of a *computed* array runs at ~13 MB/s per stream — fetching
device-side slices concurrently from host threads multiplies the streams
and recovers most of the bandwidth. ``fetch_flat`` is the standard way to
bring large codec outputs (decoded pixels, encoded byte streams) back to
the host.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np

_SLICERS = {}


def _slicer(cs: int):
    fn = _SLICERS.get(cs)
    if fn is None:
        def fn(x, i, _cs=cs):
            return jax.lax.dynamic_slice(x, (i * _cs,), (_cs,))

        fn = jax.jit(fn)
        _SLICERS[cs] = fn
    return fn


def fetch_flat(x, n_elems: int | None = None, chunk_elems: int = 1 << 22,
               threads: int = 8) -> np.ndarray:
    """Fetch the first ``n_elems`` of a rank-1 device array to host memory,
    split into fixed-size device-side slices fetched from parallel threads.

    Fixed chunk sizes keep the slice computations trace-stable (one compile
    per chunk size, cached); an out-of-range final chunk relies on
    ``lax.dynamic_slice``'s start clamping, and its overlap with the
    previous chunk is written to the matching (clamped) host offset."""
    n_total = int(x.shape[0])
    n = n_total if n_elems is None else min(int(n_elems), n_total)
    if n <= chunk_elems or n_total < chunk_elems:
        return np.asarray(jax.device_get(x))[:n]
    sl = _slicer(chunk_elems)
    n_chunks = -(-n // chunk_elems)
    out = np.empty(n_total, x.dtype)

    def fetch(k):
        pos = min(k * chunk_elems, n_total - chunk_elems)
        out[pos : pos + chunk_elems] = np.asarray(
            jax.device_get(sl(x, k))
        )

    with ThreadPoolExecutor(min(threads, n_chunks)) as ex:
        list(ex.map(fetch, range(n_chunks)))
    return out[:n]
