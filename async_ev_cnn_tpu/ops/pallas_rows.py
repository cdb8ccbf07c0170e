"""Pallas TPU kernel: row-granular rulebook conv.

The site-granular Pallas kernels (pallas_rulebook*.py) pay a small-row
penalty: a per-site receptive-field patch has only KB-sized contiguous
rows (see docs/performance.md's DMA analysis, revised by
examples/dma_microbench.py).  In an HWC-layout plane, consecutive *rows*
are contiguous memory, so the ``kh`` input rows feeding one active
output row move as a SINGLE ``[kh, Wp, C]`` descriptor (~0.5 MB at
production widths) — comfortably in the bandwidth-bound regime.

Per grid step (one active output row): DMA both planes' row windows from
HBM into double-buffered VMEM scratch (next row's DMA overlaps the current
row's compute), then contract tap-by-tap: ``acc += rows[dh, dw:dw+ow, :C]
@ K[dh, dw]`` — each a clean ``[ow, C] x [C, O]`` MXU dot.

The caller supplies the HWC transposes (one relayout per step) and
scatters the returned rows back into CHW state (ops/rulebook.py
``scatter_row_values``).  Off-TPU callers must pass ``interpret=True``.

Status: correct but NOT wired into a conv mode — end-to-end it loses to
the XLA rows path because the CHW->HWC relayout costs more than the
single-descriptor DMAs save (docs/performance.md).  It becomes the right
engine if big-map layers ever keep their planes HWC-resident.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from async_ev_cnn_tpu.ops.conv import matmul_precision
from async_ev_cnn_tpu.ops.pallas_rulebook import pad_lanes_128
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(rows_ref, fm_hbm, ca_hbm, kmat_ref, bias_ref,
            out_fm_ref, out_ca_ref, rowbuf, sems, *,
            kh: int, kw: int, ow: int, n_rows: int):
    i = pl.program_id(0)

    def dma(slot, row_i):
        y0 = rows_ref[row_i]
        return [
            pltpu.make_async_copy(
                src.at[pl.ds(y0, kh), :, :],
                rowbuf.at[slot, plane],
                sems.at[slot, plane],
            )
            for plane, src in enumerate((fm_hbm, ca_hbm))
        ]

    # warm-up: first row's copies start at step 0
    @pl.when(i == 0)
    def _():
        for c in dma(0, 0):
            c.start()

    # overlap: start the next row's copies before waiting on ours
    @pl.when(i + 1 < n_rows)
    def _():
        for c in dma((i + 1) % 2, i + 1):
            c.start()

    for c in dma(i % 2, i):
        c.wait()

    o = out_fm_ref.shape[-1]
    slot = i % 2
    acc_fm = jnp.broadcast_to(bias_ref[:].reshape(1, o), (ow, o))
    acc_ca = jnp.zeros((ow, o), jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            w_tap = kmat_ref[dy, dx]  # [C, O]
            acc_fm = acc_fm + jnp.dot(
                rowbuf[slot, 0, dy, dx:dx + ow, :], w_tap,
                preferred_element_type=jnp.float32,
                precision=matmul_precision(),  # trace-time tier, see ops/conv.py
            )
            acc_ca = acc_ca + jnp.dot(
                rowbuf[slot, 1, dy, dx:dx + ow, :], w_tap,
                preferred_element_type=jnp.float32,
                precision=matmul_precision(),
            )
    out_fm_ref[0] = acc_fm
    out_ca_ref[0] = acc_ca


@functools.partial(jax.jit, static_argnames=("interpret",))
def rows_gather_conv_pallas(
    fm_hwc: jnp.ndarray,       # [Hp, Wp, C] padded featuremap (HWC)
    ca_hwc: jnp.ndarray,       # [Hp, Wp, C] padded conv-actfn (HWC)
    kernel_hwio: jnp.ndarray,  # [kh, kw, C, O]
    bias: jnp.ndarray,         # [O]
    row_idx: jnp.ndarray,      # [R] active output rows (stride 1)
    interpret: bool = False,
):
    """Returns ``(fm_rows [R, ow, O], ca_rows [R, ow, O])``."""
    kh, kw, c, o = kernel_hwio.shape
    hp, wp, _ = fm_hwc.shape
    ow = wp - kw + 1
    r = row_idx.shape[0]
    # DMA wants the lane (channel) dim a multiple of 128; zero-pad planes
    # and the kernel's input-channel dim (exact — padded channels add 0).
    fm_hwc, ca_hwc, kernel_hwio, c = pad_lanes_128(
        fm_hwc, ca_hwc, kernel_hwio)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # row_idx
        grid=(r,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # fm_hwc stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),      # ca_hwc stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # kernel taps
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=[
            pl.BlockSpec((1, ow, o), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ow, o), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, kh, wp, c), jnp.float32),  # double-buffered rows
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((r, ow, o), jnp.float32),
        jax.ShapeDtypeStruct((r, ow, o), jnp.float32),
    ]
    fm_rows, ca_rows = pl.pallas_call(
        functools.partial(_kernel, kh=kh, kw=kw, ow=ow, n_rows=r),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(row_idx.astype(jnp.int32),
      fm_hwc.astype(jnp.float32), ca_hwc.astype(jnp.float32),
      kernel_hwio.astype(jnp.float32), bias.astype(jnp.float32))
    return fm_rows, ca_rows
