"""Batched multi-image codec pipeline with device-mesh sharding.

This is the TPU-native answer to the reference's one-image-one-thread model
(SURVEY.md §2.3): images are bucketed by static shape class, stacked, and
vmapped through the data-parallel codec kernels; the batch dimension shards
across the mesh so corpus-scale decode rides every chip's VPU + HBM.

Per-image failure isolation (SURVEY.md §5.3): malformed headers are rejected
on the host before dispatch and surface as per-image error slots instead of
poisoning the batch.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from .. import spec
from ..codec import decode_jax, encode_jax
from .mesh import batch_sharding, default_mesh


def _next_pow2(x: int) -> int:
    x = max(int(x), 1)
    return 1 << (x - 1).bit_length()


def _is_oom(e: Exception) -> bool:
    """Device out-of-memory? JAX surfaces TPU allocator failures as
    XlaRuntimeError('RESOURCE_EXHAUSTED: ...') — at dispatch time for
    sync failures, or at the first fetch of a poisoned async result."""
    return "RESOURCE_EXHAUSTED" in str(e)


#: default bound on device bytes held by dispatched-but-unfetched work
#: (inputs + outputs); beyond it the oldest pending bucket drains before
#: more dispatch. Pipelining stays (the drained bucket's compute is long
#: done), HBM stays bounded — the reference's one-call encode/decode never
#: fails on memory for a corpus that fits the host (seqoia.h:456,652).
_MAX_OUTSTANDING = 6 << 30


# ---------------------------------------------------------------------------
# Batched decode
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("colch", "compat", "out_ch", "n_max", "max_ops",
                              "src_alpha")
)
def _decode_batch_kernel(data, chunks_len, n_pixels, *, colch, compat, out_ch,
                         n_max, max_ops, src_alpha=True):
    """Returns (pixels, need_fallback): flagged rows must be re-decoded on
    the host path (SQOA: REF-op streams; compat: fixpoint non-convergence).
    """
    if compat:
        from ..codec import decode_compat

        if decode_compat.fixpoint_ok(data.shape[1], colch):
            out, converged = decode_compat.decode_stream_compat_batched(
                data, chunks_len, n_pixels,
                colch=colch, out_ch=out_ch, n_max=n_max,
            )
            return out, ~converged
        fn = functools.partial(
            decode_jax.decode_stream_compat,
            colch=colch, out_ch=out_ch, n_max=n_max, max_ops=max_ops,
        )
        out = jax.vmap(fn)(data, chunks_len, n_pixels)
        return out, jnp.zeros((data.shape[0],), bool)
    from ..codec import decode_v2

    return decode_v2.decode_stream_batched(
        data, chunks_len, n_pixels,
        colch=colch, compat=False, out_ch=out_ch, n_max=n_max,
        emit="words", src_alpha=src_alpha,
    )


def _compat_mode() -> str:
    """Batch-dispatch policy for .qoi streams. The compat index table is
    sequential pointer-chasing (decode_compat.py discusses why); on real
    INDEX-heavy content the TPU fixpoint often fails to converge within
    its cap, so the batch path defaults to the native runtime fanned out
    across host cores (~250 Mpx/s/core, reference-class per core).

    SEQOIA_COMPAT_TPU=1     every color stream takes the TPU fixpoint
                            (unconverged rows still fall back);
    SEQOIA_COMPAT_TPU=auto  each stream is probed first (one cheap
                            sequential pass, native.compat_probe): streams
                            whose predicted INDEX-chain depth fits the
                            fixpoint's iteration cap go to the TPU, the
                            rest straight to the host pool — no wasted
                            device launches on content that won't
                            converge. Prediction accuracy is pinned by
                            tests/test_compat_probe.py; correctness never
                            depends on it (flags stay authoritative).
    """
    return os.environ.get("SEQOIA_COMPAT_TPU", "")


@functools.partial(
    jax.jit, static_argnames=("colch", "out_ch", "seg", "seg_px",
                              "src_alpha")
)
def _decode_packed_kernel(data, seg_lens, *, colch, out_ch, seg, seg_px,
                          src_alpha):
    from ..codec import decode_v2

    return decode_v2.decode_stream_packed(
        data, seg_lens, colch=colch, out_ch=out_ch, seg=seg, seg_px=seg_px,
        src_alpha=src_alpha,
    )


@dataclasses.dataclass
class DecodeResult:
    pixels: np.ndarray | None  # flat uint8, or None on error
    desc: spec.SqoaDesc | None
    error: str | None = None


class BatchDecoder:
    """Decode many SQOA/QOI streams on the mesh.

    Streams are grouped into (mode, stream-bucket, pixel-bucket) classes;
    each class becomes one vmapped, batch-sharded kernel launch. Classes are
    padded to a multiple of the mesh size.

    The pipeline is phased so buckets overlap instead of serializing
    (VERDICT r3 #5): every bucket is staged (host buffers + H2D) and
    dispatched first — JAX dispatch is asynchronous, so all kernels queue
    on the device — then outputs are fetched bucket by bucket while later
    buckets are still computing. Host-pool work (compat streams, REF
    fallbacks) runs on a background thread concurrently with device work.
    ``last_timings`` exposes the {stage, compute, fetch, host}-seconds
    split of the most recent call for the bench's API leg.
    """

    def __init__(self, mesh=None, max_outstanding_bytes: int | None = None):
        self.mesh = mesh if mesh is not None else default_mesh()
        self.last_timings: dict = {}
        self.last_stats: dict = {}
        self.max_outstanding_bytes = (
            _MAX_OUTSTANDING if max_outstanding_bytes is None
            else int(max_outstanding_bytes)
        )

    def __call__(self, streams, channels: int = 0):
        import time as _time

        results: list[DecodeResult | None] = [None] * len(streams)
        groups = defaultdict(list)
        for i, data in enumerate(streams):
            desc = (
                spec.unpack_header(bytes(data[: spec.HEADER_SIZE + 1]) + b"\0" * 8)
                if len(data) >= spec.HEADER_SIZE + spec.PADDING_SIZE
                else None
            )
            if desc is None or channels < 0 or channels > 4:
                results[i] = DecodeResult(None, None, "invalid header")
                continue
            colch = desc.col_channels
            out_ch = (
                channels if channels
                else colch + (1 if (desc.channels & 1) == 0 else 0)
            )
            m_pad = _next_pow2(len(data))
            if desc.qoi_compat and colch == 3:
                m_pad = max(m_pad, 32768)  # fixpoint path tile alignment
            elif not desc.qoi_compat:
                # reduced-tile fused front floor (decode_v2): small images
                # ride the Pallas path instead of the XLA fallback
                m_pad = max(m_pad, 4096)
            start = spec.HEADER_SIZE + (0 if desc.qoi_compat else 1)
            max_ops = _next_pow2(max(len(data) - 8 - start, 1))
            n_max = max(_next_pow2(desc.n_pixels), 2048)
            key = (colch, bool(desc.qoi_compat), out_ch, m_pad, max_ops,
                   n_max, desc.has_alpha)
            groups[key].append((i, data, desc))

        n_dev = self.mesh.size
        sharding = batch_sharding(self.mesh)

        # --- phase 1: route + stage + dispatch every bucket ----------------
        # (dispatch is async: kernels queue on the device while later
        # buckets stage, and while the host pool chews its share on a
        # background thread)
        from ..utils import transfer

        host_items: list = []
        pending = []  # (items, key, out, need_fb, in_bytes)
        fallback: list = []
        t_fetch_early = 0.0
        stats = {"early_drains": 0, "oom_redispatch": 0}

        def dispatch(items, key):
            """Stage + dispatch one bucket; returns a pending entry."""
            colch, compat, out_ch, m_pad, max_ops, n_max, src_alpha = key
            from ..codec import decode_v2

            if (not compat and colch in (1, 3) and len(items) >= 2
                    and m_pad <= 8192 and n_max <= 8192 and n_dev == 1
                    and all(it[2].n_pixels == n_max for it in items)
                    and decode_v2.packed_backend_ok()):
                # segment-packed icon path: many same-size small images
                # per 32768-byte row — one front grid step per
                # 32768/m_pad images instead of one per image
                # (decode_v2.decode_stream_packed). Single-device only:
                # the packed row is one Pallas program, which GSPMD
                # cannot partition; multi-chip batches shard at bucket
                # granularity anyway.
                seg = m_pad
                k = 32768 // seg
                b_rows = -(-len(items) // k)
                buf = np.zeros((b_rows, 32768), np.uint8)
                slens = np.zeros((b_rows, k), np.int32)
                for j, (_, data, desc) in enumerate(items):
                    r, c = divmod(j, k)
                    buf[r, c * seg : c * seg + len(data)] = np.frombuffer(
                        data, np.uint8)
                    slens[r, c] = len(data) - spec.PADDING_SIZE
                out, ref = _decode_packed_kernel(
                    jnp.asarray(buf), jnp.asarray(slens), colch=colch,
                    out_ch=out_ch, seg=seg, seg_px=n_max,
                    src_alpha=src_alpha,
                )
                stats["packed_rows"] = stats.get("packed_rows", 0) + b_rows
                return (items, key, out, ref, buf.size, k)
            b = len(items)
            b_pad = -(-b // n_dev) * n_dev
            buf = np.zeros((b_pad, m_pad), np.uint8)
            clens = np.zeros((b_pad,), np.int32)
            npix = np.zeros((b_pad,), np.int32)
            for j, (_, data, desc) in enumerate(items):
                buf[j, : len(data)] = np.frombuffer(data, np.uint8)
                clens[j] = len(data) - spec.PADDING_SIZE
                npix[j] = desc.n_pixels
            args = jax.device_put(
                (jnp.asarray(buf), jnp.asarray(clens), jnp.asarray(npix)),
                (sharding, sharding, sharding),
            )
            out, need_fb = _decode_batch_kernel(
                *args, colch=colch, compat=compat, out_ch=out_ch,
                n_max=n_max, max_ops=max_ops, src_alpha=src_alpha,
            )
            return (items, key, out, need_fb, buf.size, None)

        def finish(entry):
            """Fetch one bucket's output into results/fallback."""
            items, key, out, need_fb, _, seg_k = entry
            out_ch = key[2]
            b_pad, cols = out.shape
            out = transfer.fetch_flat(out.reshape(b_pad * cols)).reshape(
                b_pad, cols
            )
            if out.dtype != np.uint8:  # emit="words": free host-side view
                out = out.view(np.uint8)  # int32 (color) / uint16 (mono+a)
            if seg_k is not None:  # packed rows: one image per segment
                out = out.reshape(b_pad * seg_k, -1)
            need_fb = np.asarray(need_fb)
            for j, (i, data, desc) in enumerate(items):
                fb_j = j // seg_k if seg_k is not None else j
                if need_fb[fb_j]:
                    # REF-op stream or unconverged compat fixpoint: native
                    # fallback, batch-parallel across host cores (the
                    # ctypes call releases the GIL) — SURVEY §7.2.
                    # (Packed rows flag per ROW: one foreign image sends
                    # its row-mates to the same byte-exact host path.)
                    fallback.append((i, data))
                else:
                    n = desc.n_pixels * out_ch
                    results[i] = DecodeResult(
                        out[j].reshape(-1)[:n].copy(), desc
                    )

        def recover(items, key):
            """OOM degradation: re-dispatch synchronously (everything else
            has drained by now), halving the bucket while it still OOMs;
            a single image that cannot fit routes to the host fallback."""
            stats["oom_redispatch"] += 1
            try:
                finish(dispatch(items, key))
            except Exception as e:
                if not _is_oom(e):
                    raise
                if len(items) == 1:
                    fallback.append((items[0][0], items[0][1]))
                    return
                recover(items[: len(items) // 2], key)
                recover(items[len(items) // 2 :], key)

        def drain_one():
            entry = pending.pop(0)
            try:
                finish(entry)
            except Exception as e:
                if not _is_oom(e):
                    raise
                # the whole queue may be poisoned: drop every device ref,
                # then re-run each bucket synchronously at bounded size
                failed = [(entry[0], entry[1])]
                for p in pending:
                    try:
                        finish(p)
                    except Exception as e2:
                        if not _is_oom(e2):
                            raise
                        failed.append((p[0], p[1]))
                pending.clear()
                for its, key in failed:
                    recover(its, key)

        def entry_bytes(entry):
            return entry[2].size * entry[2].dtype.itemsize + entry[4]

        max_outstanding = self.max_outstanding_bytes
        outstanding = 0
        t0 = _time.perf_counter()
        for (colch, compat, out_ch, m_pad, max_ops, n_max,
             src_alpha) in list(groups):
            items = groups[(colch, compat, out_ch, m_pad, max_ops, n_max,
                            src_alpha)]
            if compat:
                mode = _compat_mode()
                if mode == "auto" and colch == 3:
                    # probe-dispatch: predicted-converging streams try the
                    # TPU fixpoint, the rest go straight to the host pool
                    from .. import native
                    from ..codec import decode_compat

                    cap = decode_compat._MAX_ITERS
                    tpu_items = []
                    for it in items:
                        pr = native.compat_probe(bytes(it[1]))
                        (tpu_items if pr is not None and pr[0] < cap
                         else host_items).append(it)
                    stats["auto_tpu"] = (
                        stats.get("auto_tpu", 0) + len(tpu_items))
                    stats["auto_host"] = (
                        stats.get("auto_host", 0)
                        + len(items) - len(tpu_items))
                    if not tpu_items:
                        continue
                    items = tpu_items
                elif mode != "1":
                    # hybrid dispatch: .qoi -> host pool (see _compat_mode)
                    host_items.extend(items)
                    continue
            key = (colch, compat, out_ch, m_pad, max_ops, n_max, src_alpha)
            try:
                entry = dispatch(items, key)
            except Exception as e:
                if not _is_oom(e):
                    raise
                while pending:  # free the queue, then run degraded
                    drain_one()
                outstanding = 0
                recover(items, key)
                continue
            pending.append(entry)
            outstanding += entry_bytes(entry)
            while outstanding > max_outstanding and len(pending) > 1:
                tf = _time.perf_counter()
                outstanding -= entry_bytes(pending[0])
                drain_one()
                stats["early_drains"] += 1
                t_fetch_early += _time.perf_counter() - tf
        t_stage = _time.perf_counter() - t0 - t_fetch_early

        host_thread = None
        t_host_inline = 0.0
        if host_items:
            pairs = [(i, d) for i, d, _ in host_items]
            if pending and (os.cpu_count() or 8) > 1:
                import threading

                host_thread = threading.Thread(
                    target=self._host_pool, args=(pairs, channels, results)
                )
                host_thread.start()
            else:
                # nothing to overlap with (no device work in flight) or a
                # single-core host: the background thread only adds GIL
                # ping-pong (~35% measured on pure-host batches). Inline
                # here still overlaps any dispatched device work — JAX
                # dispatch is async and phase 2 fetches afterwards.
                t_h0 = _time.perf_counter()
                self._host_pool(pairs, channels, results)
                t_host_inline = _time.perf_counter() - t_h0

        # --- phase 2: fence the first bucket (residual compute), then fetch
        # bucket by bucket while later buckets still compute ----------------
        t0 = _time.perf_counter()
        if pending:
            try:
                float(jnp.sum(pending[0][2][:1, :1].astype(jnp.float32)))
            except Exception as e:
                if not _is_oom(e):
                    raise
        t_compute = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        while pending:
            drain_one()
        t_fetch = _time.perf_counter() - t0 + t_fetch_early

        t0 = _time.perf_counter()
        if fallback:
            self._host_pool(fallback, channels, results)
        if host_thread is not None:
            host_thread.join()
        t_host = _time.perf_counter() - t0 + t_host_inline
        self.last_timings = {
            "stage": t_stage, "compute": t_compute, "fetch": t_fetch,
            "host": t_host,
        }
        self.last_stats = stats
        return results

    @staticmethod
    def _host_pool(items, channels, results):
        """Decode (index, stream) pairs with the native runtime fanned out
        across host threads (the ctypes call releases the GIL)."""
        from concurrent.futures import ThreadPoolExecutor

        from .. import native

        def host_decode(arg):
            i, data = arg
            pix, d = native.decode(bytes(data), channels)
            if pix is None:
                return i, DecodeResult(None, None, "malformed stream")
            return i, DecodeResult(pix, spec.SqoaDesc(*d))

        workers = min(len(items), os.cpu_count() or 8)
        if workers <= 1:
            # single-core host: the pool only adds GIL ping-pong (~20%
            # measured); run the ctypes loop inline
            for it in items:
                i, r = host_decode(it)
                results[i] = r
            return
        with ThreadPoolExecutor(workers) as ex:
            for i, r in ex.map(host_decode, items):
                results[i] = r


# ---------------------------------------------------------------------------
# Batched encode
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("colch", "has_alpha", "compat", "out_cap")
)
def _encode_batch_kernel(rgba, n_valid, *, colch, has_alpha, compat, out_cap):
    from ..codec import encode_v2

    return encode_v2.encode_stream_batched(
        rgba, n_valid,
        colch=colch, has_alpha=has_alpha, compat=compat, out_cap=out_cap,
    )


class BatchEncoder:
    """Encode many images on the mesh; returns per-image byte strings.

    Output caps are adaptive (the byte-space placement kernel walks the
    whole cap, so a worst-case cap is pure wasted grid steps): each mode
    class keeps a running estimate of observed bytes/px and sizes the next
    launch from it; overflowing images re-run once at the *exact* cap their
    (always exact) totals revealed."""

    #: bytes/px estimate per (colch, has_alpha, compat); class-wide so the
    #: estimate warms up across encoder instances
    _rate_est: dict = {}

    def __init__(self, mesh=None, max_outstanding_bytes: int | None = None):
        self.mesh = mesh if mesh is not None else default_mesh()
        self.last_timings: dict = {}
        self.last_stats: dict = {}
        self.max_outstanding_bytes = (
            _MAX_OUTSTANDING if max_outstanding_bytes is None
            else int(max_outstanding_bytes)
        )

    def __call__(self, images, descs):
        import time as _time

        from ..utils import transfer

        results: list[bytes | None] = [None] * len(images)
        groups = defaultdict(list)
        for i, (pix, desc) in enumerate(zip(images, descs)):
            if pix is None or not spec.validate_encode_desc(desc):
                continue
            n_pad = _next_pow2(desc.n_pixels)
            if not desc.qoi_compat:
                # reduced-tile fused front floor (encode_v2): small images
                # ride the Pallas path instead of the XLA fallback
                n_pad = max(n_pad, 4096)
            key = (desc.col_channels, desc.has_alpha, bool(desc.qoi_compat), n_pad)
            groups[key].append((i, pix, desc))

        n_dev = self.mesh.size
        sharding = batch_sharding(self.mesh)

        # --- phase 1: route + stage + dispatch every bucket ----------------
        # (async dispatch pipelines buckets; the host share — very large
        # compat images — runs on a background thread meanwhile). Dispatched
        # -but-unfetched device bytes are bounded exactly as in BatchDecoder:
        # past the cap the oldest bucket drains before more dispatch, and a
        # RESOURCE_EXHAUSTED drains the queue and re-runs the failed bucket
        # at degraded (halved) size, down to a per-image host fallback.
        host_items: list = []
        pending = []  # (items, key, out, totals, rgba, nval, cap, in_bytes)
        stats = {"early_drains": 0, "oom_redispatch": 0}
        t_fetch_early = 0.0

        def dispatch(items, key):
            colch, has_alpha, compat, n_pad = key
            b = len(items)
            b_pad = -(-b // n_dev) * n_dev
            norm_ch = colch + has_alpha
            rgba = np.zeros((b_pad, n_pad), np.int32)
            nval = np.zeros((b_pad,), np.int32)
            for j, (_, pix, desc) in enumerate(items):
                rgba[j, : desc.n_pixels] = encode_jax.normalize_pixels_packed(
                    pix, desc
                )
                nval[j] = desc.n_pixels
            args = jax.device_put(
                (jnp.asarray(rgba), jnp.asarray(nval)), (sharding, sharding)
            )
            # Adaptive output cap from the mode class's observed bytes/px
            # (cold start: 75% of worst case). Overflow retry re-runs only
            # the offending images at the exact cap their totals revealed:
            # the kernels clip writes at out_cap but totals stay exact.
            worst = n_pad * (norm_ch + 1) + spec.PADDING_SIZE + 1
            est = BatchEncoder._rate_est.get((colch, has_alpha, compat))
            if est is None:
                cap = worst * 3 // 4
            else:
                cap = int(n_pad * est * 1.25) + spec.PADDING_SIZE + 1
            cap = min(spec.cap_bucket(cap), spec.cap_bucket(worst))
            out, totals = _encode_batch_kernel(
                *args, colch=colch, has_alpha=has_alpha, compat=compat,
                out_cap=int(cap),
            )
            return (items, key, out, totals, rgba, nval, cap, rgba.nbytes)

        def finish(entry):
            items, key, out, totals, rgba, nval, cap, _ = entry
            colch, has_alpha, compat, n_pad = key
            b = len(items)
            totals = np.asarray(totals)
            # trim the fetch to the longest actual stream in the bucket
            # (the cap buffer is mostly slack) and fetch it threaded
            # cap_bucket keeps `used` values few (the slice is trace-static)
            b_pad = out.shape[0]
            used = min(int(cap), spec.cap_bucket(int(totals[:b].max())))
            out = transfer.fetch_flat(
                out[:, :used].reshape(-1)
            ).reshape(b_pad, used)
            seen = BatchEncoder._rate_est.get((colch, has_alpha, compat))
            peak = float(totals[:b].max()) / n_pad if b else 0.0
            BatchEncoder._rate_est[(colch, has_alpha, compat)] = (
                peak if seen is None else 0.5 * seen + 0.5 * peak
            )
            over = [j for j in range(b) if totals[j] > cap]
            if over:
                worst = (n_pad * (colch + has_alpha + 1)
                         + spec.PADDING_SIZE + 1)
                full = min(spec.cap_bucket(int(totals[over].max())),
                           spec.cap_bucket(worst))
                b2 = -(-len(over) // n_dev) * n_dev
                rgba2 = np.zeros((b2, n_pad), np.int32)
                nval2 = np.zeros((b2,), np.int32)
                for jj, j in enumerate(over):
                    rgba2[jj] = rgba[j]
                    nval2[jj] = nval[j]
                args2 = jax.device_put(
                    (jnp.asarray(rgba2), jnp.asarray(nval2)),
                    (sharding, sharding),
                )
                out2, totals2 = _encode_batch_kernel(
                    *args2, colch=colch, has_alpha=has_alpha, compat=compat,
                    out_cap=int(full),
                )
                out2 = np.asarray(out2)
                totals2 = np.asarray(totals2)
            for j, (i, pix, desc) in enumerate(items):
                if totals[j] > cap:
                    jj = over.index(j)
                    results[i] = (
                        spec.pack_header(desc)
                        + out2[jj, : totals2[jj]].tobytes()
                    )
                else:
                    results[i] = (
                        spec.pack_header(desc) + out[j, : totals[j]].tobytes()
                    )

        def recover(items, key):
            """OOM degradation: synchronous re-dispatch, halving while the
            launch still OOMs; a lone image that cannot fit encodes on the
            host (the reference's one-call encode never fails on memory,
            seqoia.h:456)."""
            stats["oom_redispatch"] += 1
            try:
                finish(dispatch(items, key))
            except Exception as e:
                if not _is_oom(e):
                    raise
                if len(items) == 1:
                    self._host_encode_pool(items, results)
                    return
                recover(items[: len(items) // 2], key)
                recover(items[len(items) // 2 :], key)

        def drain_one():
            entry = pending.pop(0)
            try:
                finish(entry)
            except Exception as e:
                if not _is_oom(e):
                    raise
                failed = [(entry[0], entry[1])]
                for p in pending:
                    try:
                        finish(p)
                    except Exception as e2:
                        if not _is_oom(e2):
                            raise
                        failed.append((p[0], p[1]))
                pending.clear()
                for its, key in failed:
                    recover(its, key)

        def entry_bytes(entry):
            return entry[2].size * entry[2].dtype.itemsize + entry[7]

        max_outstanding = self.max_outstanding_bytes
        outstanding = 0
        t0 = _time.perf_counter()
        for (colch, has_alpha, compat, n_pad), items in groups.items():
            if compat and n_pad > 1 << 23:
                # Very large compat encodes stay on the host pool: the TPU
                # path (slot last-writer hash resolution, encode_v2.py)
                # is byte-exact at any tile-aligned size, but beyond ~8 Mpx
                # per image the host cores win on aggregate throughput.
                host_items.extend(items)
                continue
            key = (colch, has_alpha, compat, n_pad)
            try:
                entry = dispatch(items, key)
            except Exception as e:
                if not _is_oom(e):
                    raise
                while pending:
                    drain_one()
                outstanding = 0
                recover(items, key)
                continue
            pending.append(entry)
            outstanding += entry_bytes(entry)
            while outstanding > max_outstanding and len(pending) > 1:
                tf = _time.perf_counter()
                outstanding -= entry_bytes(pending[0])
                drain_one()
                stats["early_drains"] += 1
                t_fetch_early += _time.perf_counter() - tf
        t_stage = _time.perf_counter() - t0 - t_fetch_early

        host_thread = None
        t_host_inline = 0.0
        if host_items:
            if pending and (os.cpu_count() or 8) > 1:
                import threading

                host_thread = threading.Thread(
                    target=self._host_encode_pool, args=(host_items, results)
                )
                host_thread.start()
            else:
                # see BatchDecoder: a background thread on a single-core
                # host (or with nothing in flight) only adds GIL ping-pong
                t_h0 = _time.perf_counter()
                self._host_encode_pool(host_items, results)
                t_host_inline = _time.perf_counter() - t_h0

        # --- phase 2: fence the first bucket, then fetch bucket by bucket -
        t0 = _time.perf_counter()
        if pending:
            try:
                float(jnp.sum(pending[0][3][:1].astype(jnp.float32)))
            except Exception as e:
                if not _is_oom(e):
                    raise
        t_compute = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        while pending:
            drain_one()
        t_fetch = _time.perf_counter() - t0 + t_fetch_early

        t0 = _time.perf_counter()
        if host_thread is not None:
            host_thread.join()
        t_host = _time.perf_counter() - t0 + t_host_inline
        self.last_timings = {
            "stage": t_stage, "compute": t_compute, "fetch": t_fetch,
            "host": t_host,
        }
        self.last_stats = stats
        return results

    @staticmethod
    def _host_encode_pool(items, results):
        """Encode (index, pixels, desc) triples with the native runtime
        across host threads (the ctypes call releases the GIL)."""
        from concurrent.futures import ThreadPoolExecutor

        from .. import native

        def host_encode(arg):
            i, pix, desc = arg
            return i, native.encode(
                np.asarray(pix, np.uint8).ravel(), desc.width,
                desc.height, desc.channels, desc.colorspace,
                int(desc.qoi_compat),
            )

        if (os.cpu_count() or 8) <= 1:
            for it in items:
                i, data = host_encode(it)
                results[i] = data
            return
        with ThreadPoolExecutor(
            min(len(items), os.cpu_count() or 8)
        ) as ex:
            for i, data in ex.map(host_encode, items):
                results[i] = data


# Convenience one-shot APIs -------------------------------------------------

def corpus_decode(streams, channels: int = 0, mesh=None):
    return BatchDecoder(mesh)(streams, channels)


def corpus_encode(images, descs, mesh=None):
    return BatchEncoder(mesh)(images, descs)
