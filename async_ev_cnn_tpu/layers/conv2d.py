"""Incremental 2-D convolution layer (functional).

Semantics mirror /root/reference/src/layers/conv2d.py:9-141, recast for the
MXU:

* Active output sites are a dilation of the incoming event mask
  (replacing ``im2col_event``'s covered-set walk, cutils.pyx:71-129).
* Instead of gathering only the touched columns, the default "dense" mode
  computes the full conv (one big, regular MXU op — far faster on TPU than
  an irregular gather at these resolutions) and *commits* it only at active
  sites with a masked select; inactive sites keep their leak-decayed value.
  The result is bit-for-bit the reference's update rule with static shapes.
* The featuremap conv and the conv-actfn conv (reference runs two separate
  Cython+GEMM passes, conv2d.py:118-123) are fused into a single batched
  conv of ``[2, C, H, W]``.

The math being replicated (conv2d.py:105-137):
  1. ``before_sign = fm >= 0``
  2. ``fm -= conv_actfn_state * delta_leak``      (leak propagation)
  3. ``fm[active]  = conv(prev.featuremap)+b [active]``
  4. ``cact[active] = conv(prev.conv_actfn) [active]`` (no bias)
  5. out events = sites where any channel's sign changed, plus active sites.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from async_ev_cnn_tpu.layers.types import ConvState, LayerIO
from async_ev_cnn_tpu.ops.conv import (
    conv_out_shape,
    conv_pads,
    leaky_mask,
    matmul_precision,
)
from async_ev_cnn_tpu.ops.masks import dilate_mask
from async_ev_cnn_tpu.ops.numerics import snap


class ConvSpec(NamedTuple):
    in_shape: tuple[int, int, int]  # (C, H, W) of the previous layer
    out_channels: int
    ksize: tuple[int, int]
    stride: int
    alpha: float
    padding: str  # 'SAME' | 'VALID'
    # 'dense' | 'sparse' | 'sparse_pallas' | 'sparse_rows' | 'window' | 'full'
    mode: str = "dense"
    capacity_frac: float = 0.25  # sparse rulebook capacity as out-site fraction
    window_frac: float = 0.25  # window-mode extent as a fraction of each axis
    # inter-layer activation storage dtype for 'full' mode ('float32' |
    # 'bfloat16'): bf16 halves the HBM traffic between layers; convs still
    # accumulate in f32 (preferred_element_type) and at matmul_precision
    # 'default' the MXU reads bf16 operands either way.  Incremental modes
    # always store f32 (their state arithmetic depends on exact rounding
    # fences — ops/numerics.py).
    act_dtype: str = "float32"

    @property
    def capacity(self) -> int:
        _, oh, ow = self.out_shape
        cap = max(8, int(oh * ow * self.capacity_frac))
        return min(cap, oh * ow)

    @property
    def row_capacity(self) -> int:
        """Static active-row capacity for 'sparse_rows' mode."""
        _, oh, _ = self.out_shape
        return min(oh, max(8, int(oh * self.capacity_frac)))

    @property
    def window(self) -> tuple[int, int]:
        """Static window extent (out coords) for 'window' mode, multiple of 8."""
        _, oh, ow = self.out_shape
        wh = min(oh, max(8, (int(oh * self.window_frac) + 7) // 8 * 8))
        ww = min(ow, max(8, (int(ow * self.window_frac) + 7) // 8 * 8))
        return wh, ww

    @property
    def pads(self):
        _, h, w = self.in_shape
        return conv_pads(h, w, *self.ksize, self.stride, self.padding)

    @property
    def out_shape(self) -> tuple[int, int, int]:
        _, h, w = self.in_shape
        oh, ow = conv_out_shape(h, w, *self.ksize, self.stride, self.padding)
        return (self.out_channels, oh, ow)


def _conv_pair(spec: ConvSpec, kernel, bias, featuremap, conv_actfn):
    """One batched conv over [featuremap; conv_actfn]; bias only on the first."""
    both = jnp.stack([featuremap, conv_actfn]).astype(jnp.float32)
    out = lax.conv_general_dilated(
        both,
        kernel.astype(jnp.float32),
        window_strides=(spec.stride, spec.stride),
        padding=spec.pads,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
        precision=matmul_precision(),  # see ops/conv.py
    )
    return out[0] + bias.reshape(-1, 1, 1).astype(jnp.float32), out[1]


def _make_io(spec: ConvSpec, state: ConvState, mask) -> LayerIO:
    actfn = leaky_mask(state.featuremap, spec.alpha)
    return LayerIO(
        surface=state.featuremap,
        layer_actfn=actfn,
        # conv_actfn accessor is the *product* with the current layer mask
        # (conv2d.py:90-94).  A bare product is duplication-safe: a single
        # mul rounds identically in every fusion copy (see ops/numerics.py).
        conv_actfn=state.conv_actfn * actfn,
        mask=mask,
    )


def _conv_single(spec: ConvSpec, kernel, bias, x):
    # same pads/casts/precision as the shared dense helper — keep ONE
    # copy of the TF-padding conv call (spec.pads == conv_pads on x's
    # shape by construction)
    from async_ev_cnn_tpu.ops.conv import conv2d_dense

    return conv2d_dense(x, kernel, bias, spec.stride, spec.padding)


def _full_io(spec: ConvSpec, kernel, bias, prev_io: LayerIO) -> LayerIO:
    """Full-recompute output: one conv of the predecessor's featuremap, the
    activation folded in.  ``layer_actfn`` is a scalar 1 so ``featuremap``
    (surface * actfn) is the activated map with no extra memory traffic;
    ``conv_actfn`` is a scalar 0 placeholder — every layer downstream of a
    'full' layer is itself 'full' (enforced at build time) and never reads
    it."""
    from async_ev_cnn_tpu.ops.conv import leaky

    fm = leaky(_conv_single(spec, kernel, bias, prev_io.featuremap), spec.alpha)
    dt = jnp.dtype(spec.act_dtype)
    _, oh, ow = spec.out_shape
    return LayerIO(
        # act_dtype='bfloat16' stores the activated map (and the scalar
        # actfn, so ``featuremap`` does not silently promote back to f32)
        # in bf16 between layers; the conv above still accumulated in f32
        surface=fm.astype(dt),
        layer_actfn=jnp.ones((), dt),
        conv_actfn=jnp.zeros((), jnp.float32),
        mask=jnp.ones((oh, ow), bool),
    )


def conv_init(
    spec: ConvSpec, kernel, bias, prev_init_io: LayerIO
) -> tuple[ConvState, LayerIO]:
    """Initial state: dense conv of the predecessor's initial featuremap
    (conv2d.py:59-63); conv-actfn starts at zero."""
    if spec.mode == "full":
        # Stateless: the full-recompute step depends only on the
        # predecessor's featuremap; scalar placeholders keep the state
        # pytree structure uniform.
        state = ConvState(
            featuremap=jnp.zeros((), jnp.float32),
            conv_actfn=jnp.zeros((), jnp.float32),
        )
        return state, _full_io(spec, kernel, bias, prev_init_io)
    # single conv: the batched pair with an all-zeros second plane
    # computed (and discarded) a whole extra conv at init
    fm = _conv_single(spec, kernel, bias, prev_init_io.featuremap)
    state = ConvState(featuremap=fm, conv_actfn=jnp.zeros(spec.out_shape, jnp.float32))
    _, oh, ow = spec.out_shape
    return state, _make_io(spec, state, jnp.zeros((oh, ow), bool))


def _sparse_update(spec: ConvSpec, kernel, bias, state, prev_io, active, fm_leaked):
    """Rulebook gather->GEMM->scatter update of the active sites, with a
    lax.cond fallback to the dense-masked path on capacity overflow so
    equivalence is never sacrificed (SURVEY.md's overflow policy)."""
    from async_ev_cnn_tpu.ops.masks import mask_to_topk_coords
    from async_ev_cnn_tpu.ops.rulebook import rulebook_conv_pair, scatter_site_values

    if spec.mode == "sparse_rows":
        # rows mode gathers clamped row indices from the UNPADDED planes —
        # a full-plane jnp.pad costs more than the whole gather+conv at
        # production sizes (docs/performance.md)
        from async_ev_cnn_tpu.ops.rulebook import rows_conv_pair, scatter_row_values

        row_idx, row_valid, fm_rows, ca_rows, overflow = rows_conv_pair(
            prev_io.featuremap, prev_io.conv_actfn, active, kernel, bias,
            spec.stride, spec.row_capacity, spec.pads,
        )

        def rows_branch(_):
            fm = scatter_row_values(fm_leaked, row_idx, row_valid, active, fm_rows)
            cact = scatter_row_values(
                state.conv_actfn, row_idx, row_valid, active, ca_rows
            )
            return fm, cact

        def rows_dense_branch(_):
            conv_fm, conv_cact = _conv_pair(
                spec, kernel, bias, prev_io.featuremap, prev_io.conv_actfn
            )
            return (
                jnp.where(active, conv_fm, fm_leaked),
                jnp.where(active, conv_cact, state.conv_actfn),
            )

        return lax.cond(overflow, rows_dense_branch, rows_branch, None)

    (pt, pb), (pl, pr) = spec.pads
    pad_cfg = ((0, 0), (pt, pb), (pl, pr))
    fm_in = jnp.pad(prev_io.featuremap, pad_cfg)
    ca_in = jnp.pad(prev_io.conv_actfn, pad_cfg)
    if spec.mode == "sparse_pallas" and spec.stride == 1:
        # block-sparse kernel: one DMA per 1x8 site strip (8x fewer DMAs)
        import jax

        from async_ev_cnn_tpu.ops.masks import mask_to_block_coords
        from async_ev_cnn_tpu.ops.pallas_rulebook_blocks import (
            BLOCK_W,
            rulebook_gather_gemm_pallas_blocks,
        )

        _, oh, ow = spec.out_shape
        block_capacity = max(8, -(-spec.capacity // BLOCK_W))
        by, bx, bvalid, count = mask_to_block_coords(active, block_capacity, BLOCK_W)
        overflow = count > block_capacity
        fm_b, ca_b = rulebook_gather_gemm_pallas_blocks(
            jnp.transpose(fm_in, (1, 2, 0)),
            jnp.transpose(ca_in, (1, 2, 0)),
            jnp.transpose(kernel, (2, 3, 1, 0)),  # OIHW -> HWIO
            bias, by, bx,
            interpret=jax.default_backend() == "cpu",
        )
        # expand blocks to sites; commit only truly active in-range sites
        offs = jnp.arange(BLOCK_W, dtype=jnp.int32)
        sy = jnp.repeat(by.astype(jnp.int32), BLOCK_W)
        sx = (bx.astype(jnp.int32)[:, None] * BLOCK_W + offs[None, :]).reshape(-1)
        in_range = sx < ow
        site_active = jnp.where(
            in_range, active[sy, jnp.minimum(sx, ow - 1)], False
        )
        valid = jnp.repeat(bvalid, BLOCK_W) & site_active
        ys, xs = sy, sx
        k_sites = fm_b.shape[0] * BLOCK_W
        fm_vals = fm_b.reshape(k_sites, -1)
        ca_vals = ca_b.reshape(k_sites, -1)
    elif spec.mode == "sparse_pallas":
        import jax

        from async_ev_cnn_tpu.ops.pallas_rulebook import rulebook_gather_gemm_pallas

        ys, xs, valid = mask_to_topk_coords(active, spec.capacity)
        overflow = jnp.sum(active) > spec.capacity
        fm_vals, ca_vals = rulebook_gather_gemm_pallas(
            jnp.transpose(fm_in, (1, 2, 0)),
            jnp.transpose(ca_in, (1, 2, 0)),
            jnp.transpose(kernel, (2, 3, 1, 0)),  # OIHW -> HWIO
            bias,
            ys, xs,
            stride=spec.stride,
            interpret=jax.default_backend() == "cpu",
        )
    else:
        ys, xs, valid, fm_vals, ca_vals, overflow = rulebook_conv_pair(
            fm_in, ca_in, active, kernel, bias, spec.stride, spec.capacity
        )

    def sparse_branch(_):
        fm = scatter_site_values(fm_leaked, ys, xs, valid, fm_vals)
        cact = scatter_site_values(state.conv_actfn, ys, xs, valid, ca_vals)
        return fm, cact

    def dense_branch(_):
        conv_fm, conv_cact = _conv_pair(
            spec, kernel, bias, prev_io.featuremap, prev_io.conv_actfn
        )
        return (
            jnp.where(active, conv_fm, fm_leaked),
            jnp.where(active, conv_cact, state.conv_actfn),
        )

    return lax.cond(overflow, dense_branch, sparse_branch, None)


def _window_update(spec: ConvSpec, kernel, bias, state, prev_io, active, fm_leaked):
    """Compute the conv only inside a static-size window around the active
    bounding box (events cluster spatially on real DVS streams), with a
    lax.cond fallback to the dense-masked path when the box doesn't fit.

    Asymptotically this restores the reference's O(active-region) update
    cost while keeping every shape static and the conv MXU-shaped."""
    from async_ev_cnn_tpu.ops.masks import mask_bounding_box

    if spec.stride != 1:
        raise NotImplementedError("window mode requires stride 1")
    wh, ww = spec.window
    o, oh, ow = spec.out_shape
    kh, kw = spec.ksize
    y0, x0, y1, x1, any_active = mask_bounding_box(active)
    fits = (y1 - y0 < wh) & (x1 - x0 < ww)
    oy = jnp.clip(y0, 0, oh - wh)
    ox = jnp.clip(x0, 0, ow - ww)

    def window_branch(_):
        (pt, pb), (pl_, pr) = spec.pads
        pad_cfg = ((0, 0), (pt, pb), (pl_, pr))
        c = prev_io.surface.shape[0]
        fm_in = jnp.pad(prev_io.featuremap, pad_cfg)
        ca_in = jnp.pad(prev_io.conv_actfn, pad_cfg)
        both = jnp.stack([
            lax.dynamic_slice(fm_in, (0, oy, ox), (c, wh + kh - 1, ww + kw - 1)),
            lax.dynamic_slice(ca_in, (0, oy, ox), (c, wh + kh - 1, ww + kw - 1)),
        ])
        out = lax.conv_general_dilated(
            both, kernel.astype(jnp.float32), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
            precision=matmul_precision(),
        )
        conv_fm_w = out[0] + bias.reshape(-1, 1, 1).astype(jnp.float32)
        conv_ca_w = out[1]
        act_w = lax.dynamic_slice(active, (oy, ox), (wh, ww))
        fm_le_w = lax.dynamic_slice(fm_leaked, (0, oy, ox), (o, wh, ww))
        ca_st_w = lax.dynamic_slice(state.conv_actfn, (0, oy, ox), (o, wh, ww))
        fm = lax.dynamic_update_slice(
            fm_leaked, jnp.where(act_w, conv_fm_w, fm_le_w), (0, oy, ox)
        )
        cact = lax.dynamic_update_slice(
            state.conv_actfn, jnp.where(act_w, conv_ca_w, ca_st_w), (0, oy, ox)
        )
        return fm, cact

    def dense_branch(_):
        conv_fm, conv_cact = _conv_pair(
            spec, kernel, bias, prev_io.featuremap, prev_io.conv_actfn
        )
        return (
            jnp.where(active, conv_fm, fm_leaked),
            jnp.where(active, conv_cact, state.conv_actfn),
        )

    return lax.cond(fits, window_branch, dense_branch, None)


def conv_step(
    spec: ConvSpec,
    kernel,
    bias,
    state: ConvState,
    prev_io: LayerIO,
    delta_leak,
) -> tuple[ConvState, LayerIO]:
    if spec.mode == "full":
        # Full recompute: the TPU-optimal execution of the same semantics at
        # small resolutions — the equivalence gate proves the async update
        # rule equals the dense oracle at every site, so recomputing every
        # site (one conv, no conv-actfn pass, no leak/mask bookkeeping) is
        # the fastest exact implementation when the MXU makes the dense conv
        # cheaper than any gather (docs/performance.md crossover table).
        return state, _full_io(spec, kernel, bias, prev_io)

    active = dilate_mask(prev_io.mask, spec.ksize, spec.stride, spec.pads)

    before_sign = state.featuremap >= 0
    # The decrement is snapped so duplicated copies of this expression can
    # never disagree about the updated sign (see ops/numerics.py).
    fm_leaked = state.featuremap - snap(state.conv_actfn * delta_leak)

    if spec.mode == "window":
        fm, cact = _window_update(
            spec, kernel, bias, state, prev_io, active, fm_leaked
        )
    elif spec.mode in ("sparse", "sparse_pallas", "sparse_rows"):
        fm, cact = _sparse_update(
            spec, kernel, bias, state, prev_io, active, fm_leaked
        )
    else:
        conv_fm, conv_cact = _conv_pair(
            spec, kernel, bias, prev_io.featuremap, prev_io.conv_actfn
        )
        fm = jnp.where(active, conv_fm, fm_leaked)
        cact = jnp.where(active, conv_cact, state.conv_actfn)

    after_sign = fm >= 0
    changed = jnp.any(before_sign != after_sign, axis=0)
    out_mask = changed | active

    new_state = ConvState(featuremap=fm, conv_actfn=cact)
    return new_state, _make_io(spec, new_state, out_mask)
