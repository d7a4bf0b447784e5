"""Max pooling via `lax.reduce_window` and the morphological edge target.

The reference derives the edge ground truth from the mask with a
dilation-minus-erosion built out of +/- max_pool2d with kernel 5, stride 1,
same padding (`/root/reference/models/sam_maskdecoder_edge.py:440-446`).
`lax.reduce_window` is XLA's native windowed reduction and fuses well.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp


def max_pool_2d(x: jnp.ndarray, kernel: int, stride: int = 1) -> jnp.ndarray:
    """Same-padded max pool over the spatial axes of (B, H, W, C)."""
    pad = kernel // 2
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def morphological_edge(mask: jnp.ndarray, kernel: int = 5) -> jnp.ndarray:
    """Edge GT: (dilate(mask) - erode(mask)) > 0, as float. mask: (B,H,W,C) in [0,1]."""
    dilated = max_pool_2d(mask, kernel)
    eroded = -max_pool_2d(-mask, kernel)
    return (dilated - eroded > 0).astype(mask.dtype)
