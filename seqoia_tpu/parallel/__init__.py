"""Batched + sharded codec pipelines (data parallelism over device meshes)."""

from .batch import BatchDecoder, BatchEncoder, corpus_decode, corpus_encode
from .mesh import batch_sharding, default_mesh
from .tiled import (decode_large, decode_large_shardmap,
                    encode_large, encode_large_shardmap)

__all__ = [
    "BatchDecoder",
    "BatchEncoder",
    "corpus_decode",
    "corpus_encode",
    "default_mesh",
    "batch_sharding",
    "encode_large",
    "encode_large_shardmap",
    "decode_large",
    "decode_large_shardmap",
]
