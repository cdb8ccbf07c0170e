"""Active-site mask algebra.

This module is the TPU-native replacement for the reference's
``im2col_event`` coordinate machinery (/root/reference/src/libs/cutils.pyx:26-134).

The Cython kernel walks every event, enumerates the kernel placements whose
receptive field contains it, and dedups the resulting output coordinates via
a malloc'd ``out_covered`` bitmap (cutils.pyx:56,108-109).  The set it
produces — "all output sites whose receptive field intersects an event" —
is exactly a binary dilation of the event mask by the kernel footprint, i.e.
a max ``reduce_window`` over the (padded) event mask.  Computing it that way
gives static shapes, free dedup, and arbitrary-stride support (the Cython
kernel only supports stride==1 or stride==k, cutils.pyx:78-89).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def dilate_mask(
    mask: jnp.ndarray,
    ksize: tuple[int, int],
    stride: int,
    pads: tuple[tuple[int, int], tuple[int, int]] = ((0, 0), (0, 0)),
) -> jnp.ndarray:
    """Output active mask = sites whose receptive field touches an input site.

    Args:
      mask: bool ``[H, W]`` input active sites.
      ksize: ``(k_h, k_w)`` kernel footprint.
      stride: conv/pool stride (any value; superset of cutils.pyx:78-89).
      pads: explicit ((top, bottom), (left, right)) pads — the same pads the
        conv applies, so the mask lives in output coordinates
        (cf. conv2d.py:74-78 shifting event coords by the pad).

    Returns:
      bool ``[out_h, out_w]`` dilated active mask.
    """
    (pt, pb), (pl, pr) = pads
    padded = jnp.pad(mask, ((pt, pb), (pl, pr)))
    out = lax.reduce_window(
        padded.astype(jnp.int32),
        jnp.int32(0),
        lax.max,
        window_dimensions=ksize,
        window_strides=(stride, stride),
        padding="VALID",
    )
    return out > 0


def pool_out_shape(in_h: int, in_w: int, ksize: tuple[int, int], stride: int):
    """VALID pooling output shape (maxpool.py:27-28)."""
    return (in_h - ksize[0]) // stride + 1, (in_w - ksize[1]) // stride + 1


def window_view(x: jnp.ndarray, ksize: tuple[int, int], stride: int) -> jnp.ndarray:
    """Non-overlapping window view ``[C, H, W] -> [C, oh, ow, kh*kw]``.

    Requires ``stride == ksize`` (non-overlapping pooling — the only config
    the reference's event path supports, cutils.pyx:83-89).  Implemented as
    crop + reshape + transpose: zero-copy-ish under XLA, no gather needed.
    """
    k_h, k_w = ksize
    if stride != k_h or stride != k_w:
        raise NotImplementedError(
            "window_view requires stride == ksize (non-overlapping pooling); "
            f"got ksize={ksize} stride={stride}"
        )
    c, h, w = x.shape
    oh, ow = pool_out_shape(h, w, ksize, stride)
    x = x[:, : oh * k_h, : ow * k_w]
    x = x.reshape(c, oh, k_h, ow, k_w)
    x = x.transpose(0, 1, 3, 2, 4).reshape(c, oh, ow, k_h * k_w)
    return x


def chunk_to_mask(y, x, valid, h: int, w: int) -> jnp.ndarray:
    """Scatter padded event coordinates into a bool ``[H, W]`` mask.

    Out-of-range or invalid entries are dropped (the scatter uses 'drop'
    mode), so padding slots can simply carry coordinate 0 with valid=False.
    """
    mask = jnp.zeros((h, w), bool)
    # scatter mode='drop' only drops indices >= size; NEGATIVE coords
    # would wrap numpy-style and set spurious sites — mask them too
    ok = valid & (y >= 0) & (y < h) & (x >= 0) & (x < w)
    yy = jnp.where(ok, y, h)  # out of range -> dropped
    xx = jnp.where(ok, x, 0)
    return mask.at[yy, xx].set(True, mode="drop")


def mask_bounding_box(mask: jnp.ndarray):
    """Bounding box of the True sites of ``mask`` ``[H, W]``.

    Returns ``(y0, x0, y1, x1, any_active)`` with inclusive extents; when
    nothing is active the box is (0, 0, 0, 0).
    """
    h, w = mask.shape
    rows = jnp.any(mask, axis=1)
    cols = jnp.any(mask, axis=0)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)[:, 0]
    cidx = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)[:, 0]
    big = jnp.int32(1 << 30)
    y0 = jnp.min(jnp.where(rows, ridx, big))
    y1 = jnp.max(jnp.where(rows, ridx, -1))
    x0 = jnp.min(jnp.where(cols, cidx, big))
    x1 = jnp.max(jnp.where(cols, cidx, -1))
    any_active = jnp.any(rows)
    zero = jnp.int32(0)
    return (
        jnp.where(any_active, y0, zero),
        jnp.where(any_active, x0, zero),
        jnp.where(any_active, y1, zero),
        jnp.where(any_active, x1, zero),
        any_active,
    )


def mask_to_block_coords(mask: jnp.ndarray, capacity: int, block_w: int = 8):
    """Extract up to ``capacity`` active 1 x ``block_w`` site blocks.

    Blocks are x-aligned strips; a block is active when any of its sites is.
    Returns ``(by, bx, valid)`` each ``[capacity]`` with ``bx`` in block
    units, plus the total active-block count for overflow checks.  The
    block granularity turns per-site DMAs into per-strip DMAs in the Pallas
    rulebook kernel (8x fewer, overlap-free).
    """
    h, w = mask.shape
    wb = -(-w // block_w)
    padded = jnp.pad(mask, ((0, 0), (0, wb * block_w - w)))
    blocks = lax.reduce_window(
        padded.astype(jnp.int32), jnp.int32(0), lax.max,
        window_dimensions=(1, block_w), window_strides=(1, block_w),
        padding="VALID",
    ) > 0
    capacity = min(capacity, blocks.size)  # tiny deep layers
    by, bx, valid = mask_to_topk_coords(blocks, capacity)
    return by, bx, valid, jnp.sum(blocks)


def mask_to_topk_coords(mask: jnp.ndarray, capacity: int):
    """Extract up to ``capacity`` active coordinates from a mask (rulebook).

    Returns ``(ys, xs, valid)`` each ``[capacity]``; deterministic
    (row-major) ordering.  Used by the sparse gather->GEMM->scatter path.
    """
    h, w = mask.shape
    flat = mask.reshape(-1)
    # top_k over {1,0} with index tiebreak: scale so earlier indices win.
    n = h * w
    capacity = min(capacity, n)
    score = flat.astype(jnp.int32) * (n + 1) - jnp.arange(n, dtype=jnp.int32)
    _, idx = lax.top_k(score, capacity)
    valid = flat[idx]
    return (idx // w).astype(jnp.int32), (idx % w).astype(jnp.int32), valid
