"""Pallas TPU kernel: fused rulebook patch-gather + MXU GEMM.

The sparse path's XLA formulation (ops/rulebook.py) lowers the patch
gather to a generic XLA gather, which TPUs execute poorly.  This kernel
uses ``PrefetchScalarGridSpec``: the rulebook coordinates arrive as scalar-
prefetch arguments, each grid step DMAs its tile's receptive-field boxes
from the HWC-layout feature planes in HBM straight into VMEM scratch, and
one ``jnp.dot`` per tile pushes the patches through the MXU.

Inputs are the *HWC* transposes of the padded featuremap/conv-actfn planes
(one cheap relayout per step) so each patch is a single rectangular DMA
``[kh, kw, C]`` instead of C strided slabs.  The contraction is expressed
as a sum of per-tap ``[tile, C] x [C, O]`` dots (Mosaic cannot lane-cast a
``[kh, kw, C]`` box onto flat ``kh*kw*C`` lanes).

The scatter back into the feature map stays in XLA (``.at[].set`` with
drop-mode padding), which keeps the kernel output a dense ``[K, O]`` tile
array.  Falls back to interpret mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from async_ev_cnn_tpu.ops.conv import matmul_precision
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pad_lanes_128(fm_hwc, ca_hwc, kernel_hwio):
    """Zero-pad the channel (lane) dim of the HWC planes and the kernel's
    input-channel dim to a multiple of 128 — Mosaic DMA wants 128-lane
    minor dims; padded channels contribute exact zeros to the dots.
    Shared by all three rulebook kernels."""
    c = fm_hwc.shape[-1]
    c_pad = (-c) % 128
    if c_pad:
        fm_hwc = jnp.pad(fm_hwc, ((0, 0), (0, 0), (0, c_pad)))
        ca_hwc = jnp.pad(ca_hwc, ((0, 0), (0, 0), (0, c_pad)))
        kernel_hwio = jnp.pad(kernel_hwio, ((0, 0), (0, 0), (0, c_pad), (0, 0)))
    return fm_hwc, ca_hwc, kernel_hwio, c + c_pad


def _kernel(ys_ref, xs_ref, fm_hbm, ca_hbm, kmat_ref, bias_ref,
            out_fm_ref, out_ca_ref, patches, sems, *, tile: int,
            kh: int, kw: int, stride: int):
    i = pl.program_id(0)

    # Stage this tile's receptive-field boxes: 2 planes x `tile` sites.
    for t in range(tile):
        site = i * tile + t
        y0 = ys_ref[site] * stride
        x0 = xs_ref[site] * stride
        for plane, src in enumerate((fm_hbm, ca_hbm)):
            pltpu.make_async_copy(
                src.at[pl.ds(y0, kh), pl.ds(x0, kw), :],
                patches.at[plane, t],
                sems.at[plane, t],
            ).start()
    for t in range(tile):
        for plane, src in enumerate((fm_hbm, ca_hbm)):
            pltpu.make_async_copy(
                src.at[pl.ds(0, kh), pl.ds(0, kw), :],  # shape-only for wait
                patches.at[plane, t],
                sems.at[plane, t],
            ).wait()

    # GEMM as a sum of per-tap [tile, C] x [C, O] dots: Mosaic cannot
    # shape-cast [kh, kw, C] onto flat [kh*kw*C] lanes, so contract tap by
    # tap instead (kh*kw small; C/O are the MXU-friendly dims).
    o = out_fm_ref.shape[-1]
    acc_fm = jnp.broadcast_to(bias_ref[:].reshape(1, o), (tile, o))
    acc_ca = jnp.zeros((tile, o), jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            w_tap = kmat_ref[dy, dx]  # [C, O]
            acc_fm = acc_fm + jnp.dot(
                patches[0, :, dy, dx, :], w_tap,
                preferred_element_type=jnp.float32,
                precision=matmul_precision(),  # trace-time tier, see ops/conv.py
            )
            acc_ca = acc_ca + jnp.dot(
                patches[1, :, dy, dx, :], w_tap,
                preferred_element_type=jnp.float32,
                precision=matmul_precision(),
            )
    out_fm_ref[:] = acc_fm
    out_ca_ref[:] = acc_ca


@functools.partial(
    jax.jit, static_argnames=("stride", "tile", "interpret")
)
def rulebook_gather_gemm_pallas(
    fm_hwc: jnp.ndarray,    # [Hp, Wp, C] padded featuremap (HWC)
    ca_hwc: jnp.ndarray,    # [Hp, Wp, C] padded conv-actfn (HWC)
    kernel_hwio: jnp.ndarray,  # [kh, kw, C, O]
    bias: jnp.ndarray,      # [O]
    ys: jnp.ndarray,        # [K] rulebook output rows
    xs: jnp.ndarray,        # [K] rulebook output cols
    stride: int = 1,
    tile: int = 32,
    interpret: bool = False,
):
    """Returns ``(fm_vals [K, O], cact_vals [K, O])`` for the rulebook sites."""
    kh, kw, c, o = kernel_hwio.shape
    k = ys.shape[0]
    if k % tile:
        pad = tile - k % tile
        ys = jnp.concatenate([ys, jnp.zeros(pad, ys.dtype)])
        xs = jnp.concatenate([xs, jnp.zeros(pad, xs.dtype)])
    num_tiles = ys.shape[0] // tile
    # The per-site DMA requires the lane (channel) dim to be a multiple of
    # 128; zero-pad the planes and the kernel's input-channel dim (exact —
    # padded channels contribute 0 to the dots).
    fm_hwc, ca_hwc, kernel_hwio, c = pad_lanes_128(
        fm_hwc, ca_hwc, kernel_hwio)
    kmat = kernel_hwio.astype(jnp.float32)  # [kh, kw, C, O], indexed per tap

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ys, xs
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # fm_hwc stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # ca_hwc stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # kernel matrix
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=[
            pl.BlockSpec((tile, o), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, o), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tile, kh, kw, c), jnp.float32),
            pltpu.SemaphoreType.DMA((2, tile)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((num_tiles * tile, o), jnp.float32),
        jax.ShapeDtypeStruct((num_tiles * tile, o), jnp.float32),
    ]
    fm_vals, ca_vals = pl.pallas_call(
        functools.partial(_kernel, tile=tile, kh=kh, kw=kw, stride=stride),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(ys.astype(jnp.int32), xs.astype(jnp.int32),
      fm_hwc.astype(jnp.float32), ca_hwc.astype(jnp.float32), kmat,
      bias.astype(jnp.float32))
    return fm_vals[:k], ca_vals[:k]
