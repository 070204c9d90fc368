"""Large-image (100-400 MPix) codec with the pixel/byte dimension sharded
across a device mesh (BASELINE config 5; SURVEY.md §2.3 mapping table).

Built on the rank-1 ("flat") codec kernels: single-image intermediates
stay (N,)-shaped, which lays out tight on TPU (a rank-2 (1, N) buffer
pads its unit sublane dimension 8x and blows HBM at 100 Mpx scale).

On a one-device mesh the full Pallas engine runs (fast path). On larger
meshes the XLA expansion path is used (``expand="xla"``) because GSPMD
cannot partition a Pallas kernel; the scan-formulated codec is elementwise
passes, log-shift scans, triangular-matmul prefix sums and one monotone
scatter, all of which GSPMD partitions automatically — the carried codec
state per shard boundary (prev pixel, run phase, byte offsets) travels as
the scans' cross-shard prefix terms over ICI. Results are byte-exact with
the single-chip path; the sharding tests assert mesh-size invariance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import spec
from ..codec import decode_v2, encode_jax, encode_v2
from .mesh import default_mesh


def _pad_to(x, mult):
    return -(-int(x) // mult) * mult


def encode_large(pixels, desc: spec.SqoaDesc, mesh=None) -> bytes | None:
    """Encode one large image with its pixel dimension sharded over the mesh.

    Returns the full file bytes (byte-exact vs the single-chip encoder).
    Compat (.qoi) large images route to the host runtime (the index table
    is sequential state, see codec/decode_compat.py)."""
    if pixels is None or not spec.validate_encode_desc(desc):
        return None
    if desc.qoi_compat:
        from .. import native

        out = native.encode(
            np.asarray(pixels, np.uint8).ravel(), desc.width, desc.height,
            desc.channels, desc.colorspace, 1,
        )
        return out
    mesh = mesh if mesh is not None else default_mesh(axis="s")
    axis = mesh.axis_names[0]
    n_dev = mesh.size
    n = desc.n_pixels

    if n_dev == 1:
        # device-side byte->pixel expansion (host normalize costs seconds
        # at 100 Mpx; raw bytes also H2D 25% less than packed pixels)
        from ..ops import pallas_pack

        sharded = pallas_pack.normalize_pixels_device(pixels, desc)
        n_pad = sharded.shape[0]
    else:
        packed = encode_jax.normalize_pixels_packed(pixels, desc)
        n_pad = _pad_to(max(n, n_dev), max(n_dev * 256, 32768))
        if n_pad > n:
            packed = np.concatenate([packed, np.zeros(n_pad - n, np.int32)])
        sharded = jax.device_put(
            jnp.asarray(packed), NamedSharding(mesh, P(axis))
        )
    # optimistic cap with one exact retry: the kernels compute the true
    # byte total even when the output clips at out_cap, so an overflowing
    # first attempt tells us the exact cap the retry needs (placement cost
    # is proportional to out_cap — a tight grid beats a worst-case one)
    worst = _pad_to(n_pad * (desc.norm_channels + 1) + spec.PADDING_SIZE + 1,
                    4096)
    cap = min(_pad_to(n_pad * 5 // 4, 4096), worst)
    nval = jnp.int32(n)
    spread = "auto" if n_dev == 1 else "xla"
    while True:
        with mesh:
            out, total = encode_v2.encode_stream_flat(
                sharded, nval,
                colch=desc.col_channels, has_alpha=desc.has_alpha,
                out_cap=int(cap), spread=spread,
            )
        total = int(jax.device_get(total))
        if total <= cap:
            break
        cap = min(_pad_to(total, 32768), worst)
    from ..utils import transfer

    body = transfer.fetch_flat(out, total).tobytes()
    return spec.pack_header(desc) + body


_INIT_PACKED = int(np.int32(np.uint32(255 << 24)))

_SM_CACHE = {}


def _shardmap_encoder(shard_map, mesh, axis, cap, colch, has_alpha):
    """Compiled per-(mesh, cap, mode) shard_map encode step (cached so the
    ladder retries and repeat calls reuse compilations)."""
    key = (mesh, axis, cap, colch, has_alpha)
    fn = _SM_CACHE.get(key)
    if fn is not None:
        return fn
    P_ = P(axis)

    def body(pk_l, ip_l, ri_l, nv_l, et_l):
        out, tot = encode_v2.encode_stream_flat(
            pk_l, nv_l[0], colch=colch, has_alpha=has_alpha, out_cap=cap,
            init_prev=ip_l[0], run_in=ri_l[0], emit_tail=et_l[0],
        )
        return out, tot.reshape(1)

    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P_, P_, P_, P_, P_),
        out_specs=(P_, P_),
    ))
    _SM_CACHE[key] = fn
    return fn


def encode_large_shardmap(pixels, desc: spec.SqoaDesc, mesh=None) -> bytes | None:
    """shard_map variant of encode_large: each shard encodes its pixel
    chunk *independently* (running the full Pallas engine locally on TPU
    meshes) with the cross-shard codec state carried explicitly instead of
    through GSPMD-partitioned scans.

    The carried state per shard boundary is tiny and computed exactly in a
    host prepass: the boundary pixel (px_prev), the in-progress run length
    mod 512 (BIGRUN phase + pending flush count, seqoia.h:544-561), and
    which shard owns the image tail. Per-shard byte streams concatenate
    into the byte-exact global stream because a run crossing a boundary
    emits its flush bytes at the next change pixel — which lives in the
    next shard (seqoia.h:554-561).
    """
    if pixels is None or not spec.validate_encode_desc(desc):
        return None
    if desc.qoi_compat:
        return encode_large(pixels, desc, mesh)
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    mesh = mesh if mesh is not None else default_mesh(axis="s")
    axis = mesh.axis_names[0]
    n_dev = mesh.size

    packed = encode_jax.normalize_pixels_packed(pixels, desc)
    n = desc.n_pixels
    n_pad = _pad_to(max(n, n_dev), n_dev * 32768)
    if n_pad > n:
        packed = np.concatenate([packed, np.zeros(n_pad - n, np.int32)])
    chunk = n_pad // n_dev

    # --- host prepass: exact boundary state per shard -----------------------
    diffs = packed[1:] != packed[:-1]
    is_anchor = np.concatenate([[packed[0] != _INIT_PACKED], diffs])
    anchor = np.maximum.accumulate(
        np.where(is_anchor, np.arange(n_pad), -1)
    )
    init_prev = np.full(n_dev, _INIT_PACKED, np.int32)
    run_in = np.zeros(n_dev, np.int32)
    for s in range(1, n_dev):
        b = s * chunk
        if b <= n:
            init_prev[s] = packed[b - 1]
            run_in[s] = (b - 1 - anchor[b - 1]) % spec.SQOA_MAXRUN
    n_local = np.clip(n - chunk * np.arange(n_dev), 0, chunk).astype(np.int32)
    last_shard = max(0, -(-n // chunk) - 1)
    emit_tail = (np.arange(n_dev) == last_shard).astype(np.int32)

    worst = _pad_to(chunk * (desc.norm_channels + 1) + spec.PADDING_SIZE + 1,
                    4096)
    ladder = sorted({min(_pad_to(chunk * 5 // 4, 4096), worst),
                     min(_pad_to(chunk * 9 // 4, 4096), worst), worst})

    pk = jax.device_put(jnp.asarray(packed),
                        NamedSharding(mesh, jax.sharding.PartitionSpec(axis)))
    ip = jnp.asarray(init_prev)
    ri = jnp.asarray(run_in)
    nv = jnp.asarray(n_local)
    et = jnp.asarray(emit_tail)

    for cap in ladder:
        sm = _shardmap_encoder(
            shard_map, mesh, axis, int(cap), desc.col_channels,
            desc.has_alpha,
        )
        with mesh:
            outs, tots = sm(pk, ip, ri, nv, et)
            outs.block_until_ready()
        tots = np.asarray(jax.device_get(tots))
        if int(tots.max()) <= cap:
            break
    outs = np.asarray(jax.device_get(outs))
    parts = [outs[s * cap : s * cap + tots[s]] for s in range(n_dev)]
    return spec.pack_header(desc) + b"".join(p.tobytes() for p in parts)


def decode_large_shardmap(data: bytes, channels: int = 0, mesh=None):
    """shard_map variant of decode_large: each shard decodes an op-aligned
    byte range of the stream *independently*, with the cross-shard decoder
    state carried explicitly instead of through GSPMD-partitioned scans.

    A native token hop (sqn_scan_chunks — op lengths and pixel counts only,
    no value decoding, so it runs at memory speed) partitions the stream
    into per-shard byte ranges aligned to op starts; because the decoder's
    alpha-modifier peek is consumed with its op (seqoia.h:777-783), every
    boundary is a clean decoder entry point. Each shard then runs the
    ordinary decode kernels as if its range were a fresh stream; the only
    cross-shard state — the carried pixel value entering the shard
    (seqoia.h:716-719) — is an additive per-channel delta applied on the
    host to the pixels before the shard's first absolute anchor (RGB/RGBA
    op), chained shard to shard. Mirrors encode_large_shardmap's
    host-prepass design; match: seqoia.h:722-806.

    REF-bearing or compat streams route to the host/sequential paths."""
    desc = (
        spec.unpack_header(bytes(data[: spec.HEADER_SIZE + 1]) + b"\0" * 8)
        if len(data) >= spec.HEADER_SIZE + spec.PADDING_SIZE
        else None
    )
    if desc is None or channels < 0 or channels > 4:
        return None, None
    if desc.qoi_compat:
        return decode_large(data, channels, mesh)
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from .. import native

    mesh = mesh if mesh is not None else default_mesh(axis="s")
    axis = mesh.axis_names[0]
    n_dev = mesh.size
    if n_dev == 1:
        return decode_large(data, channels, mesh)
    colch = desc.col_channels
    out_ch = channels if channels else colch + (1 if (desc.channels & 1) == 0 else 0)
    n = desc.n_pixels
    if colch == 3 and out_ch < 3:
        # gray-only forced output of a color stream drops r/b, so the
        # shard-boundary pixel chain cannot be reconstructed from outputs
        return decode_large(data, channels, mesh)

    chunks = native.scan_chunks(bytes(data), n_dev)
    if chunks is None:  # REF / malformed: sequential fallback
        pix, d = native.decode(bytes(data), channels)
        return (pix, spec.SqoaDesc(*d)) if pix is not None else (None, None)
    byte_pos = chunks[:, 0]
    px_start = chunks[:, 1]
    anch_r = chunks[:, 2]
    anch_a = chunks[:, 3]
    chunks_len = len(data) - spec.PADDING_SIZE
    ends = np.append(byte_pos[1:], chunks_len)
    counts = np.append(px_start[1:], n) - px_start
    shard_lens = ends - byte_pos

    start = spec.HEADER_SIZE + 1
    m_pad = _pad_to(start + int(shard_lens.max()) + 1, 32768)
    rows = np.zeros((n_dev, m_pad), np.uint8)
    raw = np.frombuffer(data, np.uint8)
    for s in range(n_dev):
        rows[s, start : start + shard_lens[s]] = raw[byte_pos[s] : ends[s]]
    clens = (start + shard_lens).astype(np.int32)
    npx_row = counts.astype(np.int32)
    n_max = _pad_to(max(int(counts.max()), 1), 32768)

    P_ = P(axis)

    def body(rows_l, clen_l, npx_l):
        out, _ = decode_v2.decode_stream_batched(
            rows_l, clen_l, npx_l,
            colch=colch, compat=False, out_ch=out_ch, n_max=int(n_max),
            src_alpha=bool(desc.has_alpha),
        )
        return out

    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P_, P_),
        out_specs=P(axis, None),
    ))
    with mesh:
        out = fn(jnp.asarray(rows), jnp.asarray(clens), jnp.asarray(npx_row))
    # writable copy: np.asarray of a jax Array is a read-only view
    host = np.array(jax.device_get(out))  # (n_dev, n_max*out_ch) uint8

    # --- chained head fixups: inject the carried pixel value per shard -----
    # channel lanes of the interleaved output, in decode's emit order
    if colch == 3 and out_ch >= 3:
        rgb_lanes, alpha_lane = [0, 1, 2], (3 if out_ch == 4 else None)
    else:  # mono source: gray replicated across leading lanes
        rgb_lanes = list(range(min(out_ch, 3) if out_ch != 2 else 1))
        alpha_lane = out_ch - 1 if out_ch in (2, 4) else None
    prev = np.array([0, 0, 0, 255], np.int16)  # seqoia.h:716-719
    pieces = []
    for s in range(n_dev):
        cnt = int(counts[s])
        row = host[s, : cnt * out_ch]
        if cnt:
            k_r = (int(anch_r[s]) - int(px_start[s])
                   if anch_r[s] >= 0 else cnt)
            if colch == 3:
                deltas = prev[:3]
            else:
                deltas = prev[1:2]  # mono carries gray in g
            if k_r and np.any(deltas):
                head = row[: k_r * out_ch]
                for li, lane in enumerate(rgb_lanes):
                    d = deltas[min(li, len(deltas) - 1)]
                    if d:
                        head[lane::out_ch] += d.astype(np.uint8)
            if alpha_lane is not None:
                k_a = (int(anch_a[s]) - int(px_start[s])
                       if anch_a[s] >= 0 else cnt)
                da = prev[3] - 255
                if k_a and da:
                    row[alpha_lane : k_a * out_ch : out_ch] += np.uint8(da)
            last = row[(cnt - 1) * out_ch :].astype(np.int16)
            if colch == 3:
                prev[:3] = last[:3] if out_ch >= 3 else prev[:3]
            else:
                prev[1] = last[0]
            if alpha_lane is not None:
                prev[3] = last[alpha_lane]
        pieces.append(row)
    pixels = np.concatenate(pieces) if pieces else np.zeros(0, np.uint8)
    return pixels[: n * out_ch], desc


def decode_large(data: bytes, channels: int = 0, mesh=None):
    """Decode one large SQOA stream with the byte dimension sharded.

    Returns (flat uint8 pixels, SqoaDesc) or (None, None)."""
    desc = (
        spec.unpack_header(bytes(data[: spec.HEADER_SIZE + 1]) + b"\0" * 8)
        if len(data) >= spec.HEADER_SIZE + spec.PADDING_SIZE
        else None
    )
    if desc is None or channels < 0 or channels > 4:
        return None, None
    if desc.qoi_compat:
        # the sequential index table doesn't shard; use the host runtime
        from .. import native

        pix, d = native.decode(bytes(data), channels)
        return (pix, spec.SqoaDesc(*d)) if pix is not None else (None, None)

    mesh = mesh if mesh is not None else default_mesh(axis="s")
    axis = mesh.axis_names[0]
    n_dev = mesh.size
    colch = desc.col_channels
    out_ch = channels if channels else colch + (1 if (desc.channels & 1) == 0 else 0)

    if n_dev == 1:
        # fused single-chip path: the batched engine at B=1 (front-end +
        # butterfly compaction + in-kernel pixel emission), words output
        # so the D2H bitcast is a free host-side view
        from ..utils import transfer

        m_pad = _pad_to(len(data), 32768)
        buf = np.zeros(m_pad, np.uint8)
        buf[: len(data)] = np.frombuffer(data, np.uint8)
        n_max = _pad_to(desc.n_pixels, 32768)
        out, has_ref = decode_v2.decode_stream_batched(
            jnp.asarray(buf)[None],
            jnp.full((1,), len(data) - spec.PADDING_SIZE, jnp.int32),
            jnp.full((1,), desc.n_pixels, jnp.int32),
            colch=colch, compat=False, out_ch=out_ch, n_max=int(n_max),
            emit="words" if (n_max * out_ch) % 4 == 0 else "u8",
            src_alpha=bool(desc.has_alpha),
        )
        if bool(jax.device_get(has_ref[0])):
            from .. import native

            pix, d = native.decode(bytes(data), channels)
            return (pix, spec.SqoaDesc(*d)) if pix is not None else (None, None)
        n_out = desc.n_pixels * out_ch
        if out.dtype == jnp.int32:
            host = transfer.fetch_flat(out[0], -(-n_out // 4))
            pixels = host.view(np.uint8)[:n_out]
        else:
            pixels = transfer.fetch_flat(out[0], n_out)
        return pixels, desc

    m_pad = _pad_to(len(data), max(n_dev * 256, 32768))
    buf = np.zeros(m_pad, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    n_max = _pad_to(desc.n_pixels, max(n_dev * 2048, 4096))

    arr = jax.device_put(
        jnp.asarray(buf), NamedSharding(mesh, P(axis))
    )
    with mesh:
        out, has_ref = decode_v2.decode_stream_flat(
            arr, jnp.int32(len(data) - spec.PADDING_SIZE),
            jnp.int32(desc.n_pixels),
            colch=colch, out_ch=out_ch, n_max=int(n_max), expand="xla",
        )
        out.block_until_ready()
    if bool(jax.device_get(has_ref)):
        from .. import native

        pix, d = native.decode(bytes(data), channels)
        return (pix, spec.SqoaDesc(*d)) if pix is not None else (None, None)
    pixels = np.asarray(jax.device_get(out)).reshape(-1)
    return pixels[: desc.n_pixels * out_ch], desc
