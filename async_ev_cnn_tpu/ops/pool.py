"""Max-pooling ops: composite-key argmax and the dense oracle pool.

``composite_argmax`` is the vectorised equivalent of the reference's
``min_argmax`` Cython kernel (/root/reference/src/libs/cutils.pyx:137-179):
per window, the argmax of the surface, tie-broken by the smallest
conv-actfn value, then by the lowest index (the Cython scan keeps the first
row among exact ``(max, min)`` ties); plus the ``not_argmin`` staleness flag
— whether the winner's actfn differs from the window's actfn minimum, i.e.
the pooled max could be overtaken as leak accumulates.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def composite_argmax(surface_w: jnp.ndarray, actfn_w: jnp.ndarray):
    """Tie-broken argmax over the last axis.

    Args:
      surface_w: f32 ``[..., K]`` window values to maximise.
      actfn_w:   f32 ``[..., K]`` values that break ties (smaller wins).

    Returns:
      ``(idx, not_argmin)``: int32 ``[...]`` selected index and bool
      ``[...]`` flag — True when the selected position's ``actfn_w`` value
      differs from the window minimum (cutils.pyx:177).
    """
    m = jnp.max(surface_w, axis=-1, keepdims=True)
    is_max = surface_w == m
    big = jnp.float32(jnp.inf)
    actfn_at_max = jnp.where(is_max, actfn_w, big)
    a = jnp.min(actfn_at_max, axis=-1, keepdims=True)
    selected = is_max & (actfn_at_max == a)
    idx = jnp.argmax(selected, axis=-1).astype(jnp.int32)  # first True
    not_argmin = a[..., 0] != jnp.min(actfn_w, axis=-1)
    return idx, not_argmin


def maxpool_dense(
    x: jnp.ndarray, ksize: tuple[int, int], stride: int, padding: str = "VALID"
) -> jnp.ndarray:
    """Dense max-pool of ``[..., C, H, W]`` (oracle path, frame_tf.py:76,80)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    if x.dtype == jnp.bool_:
        init = False  # max over bool == window-wise OR
    elif jnp.issubdtype(x.dtype, jnp.floating):
        init = -jnp.inf
    else:
        init = jnp.iinfo(x.dtype).min
    out = lax.reduce_window(
        x,
        init,
        lax.max,
        window_dimensions=(1, 1, *ksize),
        window_strides=(1, 1, stride, stride),
        padding=padding,
    )
    return out[0] if squeeze else out
