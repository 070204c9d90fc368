"""TPU-tuned primitive ops (scans, prefix sums, compaction)."""

from .scan_ops import (
    blocked_cumsum,
    compose_state_maps,
    fill_forward,
    hillis_max,
    pack_state_map,
    segmented_modsum,
)

__all__ = [
    "blocked_cumsum",
    "compose_state_maps",
    "fill_forward",
    "hillis_max",
    "pack_state_map",
    "segmented_modsum",
]
