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

    packed = encode_jax.normalize_pixels_packed(pixels, desc)
    n = desc.n_pixels
    n_pad = _pad_to(max(n, n_dev), max(n_dev * 256, 32768))
    if n_pad > n:
        packed = np.concatenate([packed, np.zeros(n_pad - n, np.int32)])
    # heuristic cap ladder with worst-case retry (most content sits well
    # under 1 byte/px; the worst case is norm_channels+1)
    worst = _pad_to(n_pad * (desc.norm_channels + 1) + spec.PADDING_SIZE + 1,
                    4096)
    ladder = [c for c in (
        _pad_to(n_pad * 5 // 4, 4096), _pad_to(n_pad * 11 // 4, 4096), worst
    ) if c <= worst] or [worst]

    sharded = jax.device_put(
        jnp.asarray(packed), NamedSharding(mesh, P(axis))
    )
    nval = jnp.int32(n)
    spread = "auto" if n_dev == 1 else "xla"
    for cap in ladder:
        with mesh:
            out, total = encode_v2.encode_stream_flat(
                sharded, nval,
                colch=desc.col_channels, has_alpha=desc.has_alpha,
                out_cap=int(cap), spread=spread,
            )
            out.block_until_ready()
        total = int(jax.device_get(total))
        if total <= cap:
            break
    body = np.asarray(jax.device_get(out))[:total].tobytes()
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

    m_pad = _pad_to(len(data), max(n_dev * 256, 32768))
    buf = np.zeros(m_pad, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    n_max = _pad_to(desc.n_pixels, max(n_dev * 2048, 4096))

    arr = jax.device_put(
        jnp.asarray(buf), NamedSharding(mesh, P(axis))
    )
    expand = "auto" if n_dev == 1 else "xla"
    with mesh:
        out, has_ref = decode_v2.decode_stream_flat(
            arr, jnp.int32(len(data) - spec.PADDING_SIZE),
            jnp.int32(desc.n_pixels),
            colch=colch, out_ch=out_ch, n_max=int(n_max), expand=expand,
        )
        out.block_until_ready()
    if bool(jax.device_get(has_ref)):
        from .. import native

        pix, d = native.decode(bytes(data), channels)
        return (pix, spec.SqoaDesc(*d)) if pix is not None else (None, None)
    pixels = np.asarray(jax.device_get(out)).reshape(-1)
    return pixels[: desc.n_pixels * out_ch], desc
