"""TPU codec ops: data-parallel encode/decode pipelines."""

from .encode_jax import encode, encode_stream, normalize_pixels
from .decode_jax import decode, decode_stream, decode_stream_compat

__all__ = [
    "encode",
    "encode_stream",
    "normalize_pixels",
    "decode",
    "decode_stream",
    "decode_stream_compat",
]
