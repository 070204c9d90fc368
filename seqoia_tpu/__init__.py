"""seqoia_tpu — a TPU-native rebuild of the SQOA/QOI lossless image codec.

Public surface mirrors the reference library (sqoa_encode / sqoa_decode /
sqoa_read / sqoa_write, reference: seqoia.h:336-374) with byte-exact
bitstreams, plus batched + sharded pipelines for dataloading-scale
throughput on TPU meshes.

Two interchangeable backends:
  * ``backend="tpu"`` — data-parallel JAX/Pallas pipelines (default).
  * ``backend="native"`` — the C host runtime (also the parity oracle).
"""

from __future__ import annotations

import numpy as np

from . import native, spec
from .spec import (
    CHAN_BGR,
    CHAN_BGRA,
    CHAN_MONO,
    CHAN_MONOA,
    CHAN_RGB,
    CHAN_RGBA,
    LINEAR,
    SRGB,
    SqoaDesc,
)

__version__ = "0.1.0"

__all__ = [
    "SqoaDesc",
    "encode",
    "decode",
    "read",
    "write",
    "spec",
    "native",
    "CHAN_MONO", "CHAN_MONOA", "CHAN_RGB", "CHAN_RGBA", "CHAN_BGR",
    "CHAN_BGRA", "SRGB", "LINEAR",
]


def encode(pixels, desc: SqoaDesc, backend: str = "tpu") -> bytes | None:
    """Encode raw pixels into a SQOA or QOI image in memory
    (parity surface for sqoa_encode, reference: seqoia.h:363,456).

    Returns the encoded bytes, or None on invalid parameters."""
    if backend == "native":
        if desc is None or pixels is None or not spec.validate_encode_desc(desc):
            return None
        return native.encode(
            np.asarray(pixels, dtype=np.uint8).ravel(),
            desc.width,
            desc.height,
            desc.channels,
            desc.colorspace,
            desc.qoi_compat,
        )
    from . import codec

    return codec.encode(pixels, desc)


def decode(data: bytes, channels: int = 0, backend: str = "tpu"):
    """Decode a SQOA or QOI image from memory
    (parity surface for sqoa_decode, reference: seqoia.h:374,652).

    Returns (pixels, desc) where pixels is a flat uint8 numpy array, or
    (None, None) on malformed input."""
    if backend == "native":
        pixels, d = native.decode(bytes(data), channels)
        if pixels is None:
            return None, None
        return pixels, SqoaDesc(*d)
    from . import codec

    return codec.decode(data, channels)


def write(filename: str, pixels, desc: SqoaDesc, backend: str = "tpu") -> int:
    """Encode and write to the file system; returns bytes written or 0
    (parity surface for sqoa_write, reference: seqoia.h:336,814)."""
    data = encode(pixels, desc, backend=backend)
    if data is None:
        return 0
    try:
        with open(filename, "wb") as f:
            f.write(data)
    except OSError:
        return 0
    return len(data)


def read(filename: str, channels: int = 0, backend: str = "tpu",
         strict: bool = False):
    """Read and decode a SQOA/QOI file; returns (pixels, desc) or
    (None, None) (parity surface for sqoa_read, reference: seqoia.h:350,838).

    With ``strict=True`` the two failure modes raise distinct errors instead
    of both collapsing to (None, None): ``FileNotFoundError``/``OSError`` for
    I/O failures, ``ValueError`` for files that read fine but do not decode.
    """
    try:
        with open(filename, "rb") as f:
            data = f.read()
    except OSError:
        if strict:
            raise
        return None, None
    pixels, desc = decode(data, channels, backend=backend) if data else (None, None)
    if pixels is None and strict:
        raise ValueError(f"undecodable SQOA/QOI data in {filename!r}")
    return pixels, desc
