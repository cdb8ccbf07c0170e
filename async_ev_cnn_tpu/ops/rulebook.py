"""Sparse active-site rulebook: gather -> GEMM -> scatter conv updates.

The TPU-native analog of the reference's event-windowed conv
(``conv2d_event``, /root/reference/src/layers/conv2d.py:144-181 +
cutils.pyx:26-134): instead of computing the full dense conv and masking
the commit (the default "dense" mode), extract the active output
coordinates into a fixed-capacity padded rulebook, gather only those
receptive-field patches, push them through one MXU GEMM, and scatter the
results back.

Worthwhile per layer when the active fraction is small and the feature
map large; note the network-level measurements in docs/performance.md —
full recompute beat every incremental composition tested, so
``conv_mode='auto'`` resolves to 'full' and these paths are explicit
per-layer opt-ins.  Capacity overflow falls back to the dense path via
``lax.cond`` so equivalence is never sacrificed.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from async_ev_cnn_tpu.ops.masks import mask_to_topk_coords


def patch_indices(ys, xs, stride: int, ksize: tuple[int, int], padded_w: int):
    """Flat spatial indices of each rulebook entry's receptive field.

    Returns ``[K, kh*kw]`` indices into a ``[Hp * Wp]``-flattened padded
    input plane, where entry k's patch top-left is ``(ys[k]*s, xs[k]*s)``.
    """
    kh, kw = ksize
    dy = jnp.arange(kh, dtype=jnp.int32).reshape(kh, 1)
    dx = jnp.arange(kw, dtype=jnp.int32).reshape(1, kw)
    offs = (dy * padded_w + dx).reshape(1, kh * kw)
    base = (ys.astype(jnp.int32) * stride * padded_w + xs.astype(jnp.int32) * stride)
    return base[:, None] + offs


def gather_patches(planes: jnp.ndarray, sp_idx: jnp.ndarray) -> jnp.ndarray:
    """Gather patches from ``planes`` ``[N, C, Hp, Wp]`` at ``sp_idx``
    ``[K, kh*kw]`` -> ``[N, K, C * kh * kw]``."""
    n, c, hp, wp = planes.shape
    flat = planes.reshape(n, c, hp * wp)
    # [N, C, K, kk]
    patches = jnp.take(flat, sp_idx, axis=2)
    k = sp_idx.shape[0]
    return jnp.transpose(patches, (0, 2, 1, 3)).reshape(n, k, c * sp_idx.shape[1])


def rulebook_conv_pair(
    featuremap: jnp.ndarray,   # [C, Hp, Wp] padded
    conv_actfn: jnp.ndarray,   # [C, Hp, Wp] padded
    active: jnp.ndarray,       # [oh, ow]
    kernel: jnp.ndarray,       # [O, C, kh, kw]
    bias: jnp.ndarray,         # [O]
    stride: int,
    capacity: int,
):
    """Event-windowed conv of the (featuremap, conv-actfn) pair at the
    active sites.

    Returns ``(ys, xs, valid, fm_vals [K, O], cact_vals [K, O], overflow)``
    where ``overflow`` is True when the active count exceeded ``capacity``
    (the caller must then take the dense path to preserve equivalence).
    """
    o, c, kh, kw = kernel.shape
    ys, xs, valid = mask_to_topk_coords(active, capacity)
    overflow = jnp.sum(active) > capacity

    sp_idx = patch_indices(ys, xs, stride, (kh, kw), featuremap.shape[-1])
    # gather per plane, then stack the SMALL [K, C*kh*kw] results: a
    # jnp.stack of the full planes materialises a second copy of both
    # (the same full-plane-traffic cost rows_conv_pair documents)
    patches = jnp.stack([
        gather_patches(featuremap[None], sp_idx)[0],
        gather_patches(conv_actfn[None], sp_idx)[0],
    ])                                                           # [2, K, C*kh*kw]
    kmat = kernel.reshape(o, c * kh * kw).T                      # [C*kh*kw, O]
    out = jnp.einsum(
        "nkd,do->nko", patches, kmat.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,  # see ops/conv.py
    )
    fm_vals = out[0] + bias.astype(jnp.float32)[None, :]
    return ys, xs, valid, fm_vals, out[1], overflow


def scatter_site_values(dest: jnp.ndarray, ys, xs, valid, vals: jnp.ndarray):
    """Scatter ``vals [K, O]`` into ``dest [O, oh, ow]`` at the rulebook
    coordinates; invalid entries are dropped."""
    oh = dest.shape[-2]
    yy = jnp.where(valid, ys, oh)  # out of range -> dropped
    return dest.at[:, yy, xs].set(vals.T, mode="drop")


def rows_conv_pair(
    featuremap: jnp.ndarray,   # [C, H, W] UNPADDED
    conv_actfn: jnp.ndarray,   # [C, H, W] UNPADDED
    active: jnp.ndarray,       # [oh, ow]
    kernel: jnp.ndarray,       # [O, C, kh, kw]
    bias: jnp.ndarray,         # [O]
    stride: int,
    row_capacity: int,
    pads,                      # ((pt, pb), (pl, pr)) conv padding
):
    """Row-granular sparse conv of the (featuremap, conv-actfn) pair.

    Site-granular gathers pay a small-row-geometry penalty (the per-site
    receptive-field patch has only KB-sized rows; docs/performance.md's
    DMA analysis), while whole input *rows* move at real bandwidth.  This
    kernel gathers the ``kh`` input rows feeding each active output row,
    runs one batched VALID conv over the ``[2R, C, kh, Wp]`` row stack
    (MXU-shaped), and hands back whole output rows for a row-granular
    commit.

    Inputs stay UNPADDED: a full-plane ``jnp.pad`` costs ~1.6 ms at
    512x640x64 — more than the whole gather+conv.  Instead, row indices are
    clamped into range, out-of-range (conceptually padded) rows are zeroed
    after the gather, and the width halo is padded on the small gathered
    block only.  Gathering per plane (two takes) rather than stacking
    avoids materialising a second full copy of both planes.

    Returns ``(row_idx [R], row_valid [R], fm_rows [R, O, ow],
    ca_rows [R, O, ow], overflow)``.
    """
    o, c, kh, kw = kernel.shape
    (pt, _), (pl, pr) = pads
    h = featuremap.shape[1]
    row_act = jnp.any(active, axis=1)  # [oh]
    n_rows = jnp.sum(row_act)
    overflow = n_rows > row_capacity
    row_idx = jnp.nonzero(row_act, size=row_capacity, fill_value=0)[0]
    row_valid = jnp.arange(row_capacity) < n_rows

    # input rows feeding output row r: r*stride - pt + [0, kh)
    take = (row_idx[:, None] * stride - pt
            + jnp.arange(kh, dtype=row_idx.dtype)[None, :])  # [R, kh]
    in_range = ((take >= 0) & (take < h)).reshape(-1)
    take_c = jnp.clip(take, 0, h - 1).reshape(-1)
    zero = jnp.where(in_range, jnp.float32(1), jnp.float32(0))[None, :, None]

    def gather(plane):
        g = jnp.take(plane, take_c, axis=1) * zero        # [C, R*kh, W]
        g = jnp.pad(g, ((0, 0), (0, 0), (pl, pr)))        # width halo only
        g = g.reshape(c, row_capacity, kh, -1)
        return jnp.transpose(g, (1, 0, 2, 3))             # [R, C, kh, Wp]

    rows = jnp.concatenate(
        [gather(featuremap), gather(conv_actfn)]
    )                                                     # [2R, C, kh, Wp]
    out = lax.conv_general_dilated(
        rows.astype(jnp.float32), kernel.astype(jnp.float32),
        window_strides=(1, stride), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,  # see ops/conv.py
    )                                                     # [2R, O, 1, ow]
    out = out[:, :, 0, :]
    fm_rows = out[:row_capacity] + bias.astype(jnp.float32).reshape(1, -1, 1)
    return row_idx, row_valid, fm_rows, out[row_capacity:], overflow


def scatter_row_values(dest: jnp.ndarray, row_idx, row_valid, active, vals):
    """Commit row values ``[R, O, ow]`` into ``dest [O, oh, ow]``: within a
    gathered row, only truly active sites are overwritten.  Padding entries
    alias row 0 in the gather; they must scatter out-of-range (dropped) or
    an undefined duplicate-write order could clobber a real row-0 update."""
    oh = dest.shape[-2]
    old = jnp.take(dest, row_idx, axis=1)                  # [O, R, ow]
    sel = active[row_idx] & row_valid[:, None]             # [R, ow]
    new = jnp.where(sel[None], jnp.transpose(vals, (1, 0, 2)), old)
    idx_w = jnp.where(row_valid, row_idx, oh)
    return dest.at[:, idx_w].set(new, mode="drop")
