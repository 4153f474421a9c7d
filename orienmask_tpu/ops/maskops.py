"""Bit-packing for boolean instance masks.

Moving (K, H, W) boolean masks device->host dominates PCIe traffic at inference
(the reference pays the same cost implicitly, eval/orienmask_yolo_postprocess.py
returns full bool masks).  Packing 8 pixels/byte on-device cuts the transfer 8x;
the host side unpacks with numpy.
"""

import jax.numpy as jnp
import numpy as np

_POW2 = np.array([128, 64, 32, 16, 8, 4, 2, 1], np.uint8)  # MSB-first like np.packbits


def pack_bits(masks):
    """(..., W) bool -> (..., ceil(W/8)) uint8, MSB-first (np.packbits layout)."""
    w = masks.shape[-1]
    pad = (-w) % 8
    if pad:
        masks = jnp.pad(masks, [(0, 0)] * (masks.ndim - 1) + [(0, pad)])
    g = masks.reshape(*masks.shape[:-1], -1, 8).astype(jnp.uint8)
    return (g * jnp.asarray(_POW2)).sum(axis=-1).astype(jnp.uint8)


def unpack_bits_np(packed, width):
    """Inverse of pack_bits on host numpy: (..., W/8) uint8 -> (..., width) bool."""
    bits = np.unpackbits(np.asarray(packed), axis=-1)
    return bits[..., :width].astype(bool)
