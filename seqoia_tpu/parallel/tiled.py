"""Large-image (100-400 MPix) codec with the pixel/byte dimension sharded
across a device mesh (BASELINE config 5; SURVEY.md §2.3 mapping table).

The scan-formulated codecs are built from elementwise passes, log-shift
scans, triangular-matmul prefix sums, sorts and one monotone scatter — all
of which GSPMD partitions automatically, inserting the cross-shard
collectives (the carried codec state per tile boundary — prev pixel, run
phase, byte offsets — travels as the scans' cross-shard prefix terms over
ICI). No hand-written communication is required; the Pallas expansion
engine is bypassed (``expand="xla"``) because GSPMD cannot partition it.

Encoded/decoded results are byte-exact with the single-chip path; the
sharding tests assert mesh-size invariance.
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

    Returns the full file bytes (byte-exact vs the single-chip encoder)."""
    if pixels is None or not spec.validate_encode_desc(desc):
        return None
    mesh = mesh if mesh is not None else default_mesh(axis="s")
    axis = mesh.axis_names[0]
    n_dev = mesh.size

    rgba = encode_jax.normalize_pixels(pixels, desc)
    n = desc.n_pixels
    n_pad = _pad_to(max(n, n_dev), n_dev * 256)
    if n_pad > n:
        rgba = np.concatenate(
            [rgba, np.zeros((n_pad - n, 4), np.int32)], axis=0
        )
    cap = _pad_to(n_pad * (desc.norm_channels + 1) + spec.PADDING_SIZE + 1, 2048)

    sharded = jax.device_put(
        jnp.asarray(rgba)[None], NamedSharding(mesh, P(None, axis, None))
    )
    nval = jax.device_put(
        jnp.asarray([n], jnp.int32), NamedSharding(mesh, P())
    )
    with mesh:
        out, total = encode_v2.encode_stream_batched(
            sharded, nval,
            colch=desc.col_channels, has_alpha=desc.has_alpha,
            compat=bool(desc.qoi_compat), out_cap=int(cap), spread="xla",
        )
        out.block_until_ready()
    total = int(jax.device_get(total)[0])
    body = np.asarray(jax.device_get(out[0]))[:total].tobytes()
    return spec.pack_header(desc) + body


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

    m_pad = _pad_to(len(data), n_dev * 256)
    buf = np.zeros(m_pad, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    n_max = _pad_to(desc.n_pixels, n_dev * 2048)

    arr = jax.device_put(
        jnp.asarray(buf)[None], NamedSharding(mesh, P(None, axis))
    )
    cl = jnp.asarray([len(data) - spec.PADDING_SIZE], jnp.int32)
    npx = jnp.asarray([desc.n_pixels], jnp.int32)
    with mesh:
        out, has_ref = decode_v2.decode_stream_batched(
            arr, cl, npx,
            colch=colch, compat=False, out_ch=out_ch, n_max=int(n_max),
            expand="xla",
        )
        out.block_until_ready()
    if bool(jax.device_get(has_ref)[0]):
        from .. import native

        pix, d = native.decode(bytes(data), channels)
        return (pix, spec.SqoaDesc(*d)) if pix is not None else (None, None)
    pixels = np.asarray(jax.device_get(out[0])).reshape(-1)
    return pixels[: desc.n_pixels * out_ch], desc
