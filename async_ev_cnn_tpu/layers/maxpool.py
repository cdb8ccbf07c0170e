"""Incremental max-pool layer (functional).

Semantics mirror /root/reference/src/layers/maxpool.py:8-165:

* State is the within-window argmax index per ``(channel, oy, ox)`` plus the
  ``recompute`` set — windows whose winner is not also the conv-actfn argmin
  and may be overtaken as leak accumulates (maxpool.py:33-36).
* Per step: clear event windows from the recompute set, take the union as
  the active window set, re-run the composite-key argmax there, re-flag
  unstable windows, and emit every active window as an output event
  (maxpool.py:116-154).  Faithfully replicated quirk: recompute windows
  that become stable are *not* cleared — only an event landing on them
  clears the flag (maxpool.py:120 is the only ``False`` write).
* Outputs are lazy gathers at the stored indices (maxpool.py:42-79).  With
  non-overlapping windows (``stride == ksize`` — the only config the
  reference's event path supports, cutils.pyx:83-89) the im2col is a pure
  reshape and the gather a ``take_along_axis`` — no irregular memory access.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from async_ev_cnn_tpu.layers.types import LayerIO, PoolState
from async_ev_cnn_tpu.ops.masks import dilate_mask, pool_out_shape, window_view
from async_ev_cnn_tpu.ops.pool import composite_argmax


class PoolSpec(NamedTuple):
    in_shape: tuple[int, int, int]  # (C, H, W) of the previous layer
    ksize: tuple[int, int]
    stride: int
    mode: str = "event"  # 'event' (incremental) | 'full' (dense recompute)
    act_dtype: str = "float32"  # 'full'-mode activation storage (see ConvSpec)

    @property
    def out_shape(self) -> tuple[int, int, int]:
        c, h, w = self.in_shape
        oh, ow = pool_out_shape(h, w, self.ksize, self.stride)
        return (c, oh, ow)


def _full_pool_io(spec: PoolSpec, prev_io: LayerIO) -> LayerIO:
    """Full-recompute pool: dense max over the *activated* map.  The leaky
    activation is monotone (x -> x if x>0 else alpha*x with alpha>0), so
    max(activated) == activated(argmax of surface) — identical to gathering
    at the reference's window argmax."""
    from async_ev_cnn_tpu.ops.pool import maxpool_dense

    fm = maxpool_dense(prev_io.featuremap, spec.ksize, spec.stride, "VALID")
    dt = jnp.dtype(spec.act_dtype)
    _, oh, ow = spec.out_shape
    return LayerIO(
        surface=fm.astype(dt),  # max over bf16 inputs is exact in bf16
        layer_actfn=jnp.ones((), dt),
        conv_actfn=jnp.zeros((), jnp.float32),
        mask=jnp.ones((oh, ow), bool),
    )


def _gather(spec: PoolSpec, array, idx):
    """Pooled view of ``array`` at the stored indices: [C,H,W] -> [C,oh,ow].

    Expressed as a one-hot select over the (small) window axis rather than a
    gather: gathers with per-element indices serialize badly on TPU, while
    compare+multiply+sum is pure VPU work — and exact (a single x*1 term),
    so it is also duplication-safe (see ops/numerics.py).
    """
    win = window_view(array, spec.ksize, spec.stride)  # [C, oh, ow, kk]
    kk = win.shape[-1]
    onehot = idx[..., None] == jnp.arange(kk, dtype=idx.dtype)
    return jnp.sum(jnp.where(onehot, win, jnp.zeros((), win.dtype)), axis=-1)


def _make_io(spec: PoolSpec, prev_io: LayerIO, idx, mask) -> LayerIO:
    return LayerIO(
        surface=_gather(spec, prev_io.surface, idx),
        layer_actfn=_gather(spec, prev_io.layer_actfn, idx),
        conv_actfn=_gather(spec, prev_io.conv_actfn, idx),
        mask=mask,
    )


def pool_init(spec: PoolSpec, prev_init_io: LayerIO) -> tuple[PoolState, LayerIO]:
    """Initial indices: plain argmax of the initial surface (maxpool.py:31-35)."""
    if spec.mode == "full":
        state = PoolState(
            idx_max=jnp.zeros((), jnp.int32), recompute=jnp.zeros((), bool)
        )
        return state, _full_pool_io(spec, prev_init_io)
    surf_w = window_view(prev_init_io.surface, spec.ksize, spec.stride)
    idx = jnp.argmax(surf_w, axis=-1).astype(jnp.int32)
    _, oh, ow = spec.out_shape
    state = PoolState(idx_max=idx, recompute=jnp.zeros((oh, ow), bool))
    return state, _make_io(spec, prev_init_io, idx, jnp.zeros((oh, ow), bool))


def pool_step_full_recompute(
    spec: PoolSpec, state: PoolState, prev_io: LayerIO, delta_leak
) -> tuple[PoolState, LayerIO]:
    """Simpler oracle variant: recompute the dense argmax of every window
    each step and emit events where the winning index changed (the analog
    of the reference's unused ``MaxPoolLayerPartiallyEvent``,
    maxpool_partial.py:96-105).  Used as a mid-step oracle when debugging
    the incremental pool; not the production path."""
    surf_w = window_view(prev_io.surface, spec.ksize, spec.stride)
    idx = jnp.argmax(surf_w, axis=-1).astype(jnp.int32)
    ev_windows = dilate_mask(prev_io.mask, spec.ksize, spec.stride)
    changed = jnp.any(idx != state.idx_max, axis=0)
    active = ev_windows | changed
    new_state = PoolState(idx_max=idx, recompute=state.recompute)
    return new_state, _make_io(spec, prev_io, idx, active)


def pool_step(
    spec: PoolSpec, state: PoolState, prev_io: LayerIO, delta_leak
) -> tuple[PoolState, LayerIO]:
    if spec.mode == "full":
        return state, _full_pool_io(spec, prev_io)
    ev_windows = dilate_mask(prev_io.mask, spec.ksize, spec.stride)
    recompute = state.recompute & ~ev_windows  # maxpool.py:120
    active = ev_windows | recompute            # maxpool.py:124-126

    surf_w = window_view(prev_io.surface, spec.ksize, spec.stride)
    cact_w = window_view(prev_io.conv_actfn, spec.ksize, spec.stride)

    idx_new, not_argmin_c = composite_argmax(surf_w, cact_w)  # per channel
    not_argmin = jnp.any(not_argmin_c, axis=0)                # maxpool.py:140-141

    idx = jnp.where(active[None], idx_new, state.idx_max)
    recompute = recompute | (active & not_argmin)             # maxpool.py:142

    new_state = PoolState(idx_max=idx, recompute=recompute)
    return new_state, _make_io(spec, prev_io, idx, active)
