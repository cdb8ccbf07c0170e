"""Block-sparse Pallas rulebook kernel: per-strip DMAs instead of per-site.

The per-site kernel (ops/pallas_rulebook.py) is DMA-latency bound: K sites
cost 2K small DMAs.  This variant works on x-aligned 1 x ``BLOCK_W`` site
blocks: one DMA moves the ``[kh, BLOCK_W + kw - 1, C]`` input strip covering
all BLOCK_W sites of a block (8x fewer DMAs and the intra-block patch
overlap is fetched once).  The contraction stays per-tap but each dot now
covers ``tile * BLOCK_W`` sites:

    out[b, s, :] = sum_{dy, dx} strip[b, dy, s + dx, :] @ W[dy, dx]

Commit semantics stay exact: the caller scatters per *site* with the true
active mask, so block-covered-but-inactive sites keep their decayed values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from async_ev_cnn_tpu.ops.conv import matmul_precision
from async_ev_cnn_tpu.ops.pallas_rulebook import pad_lanes_128
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_W = 8


def _kernel(by_ref, bx_ref, fm_hbm, ca_hbm, kmat_ref, bias_ref,
            out_fm_ref, out_ca_ref, strips, sems, *, tile: int,
            kh: int, kw: int):
    """Double-buffered across grid steps: tile i+1's strip DMAs are issued
    before waiting on tile i's, so transfers pipeline back-to-back instead
    of paying (latency + compute) per tile."""
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    strip_w = BLOCK_W + kw - 1
    cur = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    def start(buf, tile_idx):
        for t in range(tile):
            blk = tile_idx * tile + t
            y0 = by_ref[blk]
            x0 = bx_ref[blk] * BLOCK_W
            for plane, src in enumerate((fm_hbm, ca_hbm)):
                pltpu.make_async_copy(
                    src.at[pl.ds(y0, kh), pl.ds(x0, strip_w), :],
                    strips.at[buf, plane, t],
                    sems.at[buf, plane, t],
                ).start()

    @pl.when(i == 0)
    def _():
        start(cur, i)

    @pl.when(i + 1 < n_tiles)
    def _():
        start(nxt, i + 1)

    for t in range(tile):
        for plane, src in enumerate((fm_hbm, ca_hbm)):
            pltpu.make_async_copy(
                src.at[pl.ds(0, kh), pl.ds(0, strip_w), :],
                strips.at[cur, plane, t],
                sems.at[cur, plane, t],
            ).wait()

    o = out_fm_ref.shape[-1]
    n = tile * BLOCK_W
    acc_fm = jnp.broadcast_to(bias_ref[:].reshape(1, o), (n, o))
    acc_ca = jnp.zeros((n, o), jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            w_tap = kmat_ref[dy, dx]  # [C, O]
            # [tile, BLOCK_W, C] slice of the strips, collapsed over blocks
            lhs_fm = strips[cur, 0, :, dy, dx : dx + BLOCK_W, :].reshape(n, -1)
            lhs_ca = strips[cur, 1, :, dy, dx : dx + BLOCK_W, :].reshape(n, -1)
            acc_fm = acc_fm + jnp.dot(
                lhs_fm, w_tap, preferred_element_type=jnp.float32,
                precision=matmul_precision(),
            )
            acc_ca = acc_ca + jnp.dot(
                lhs_ca, w_tap, preferred_element_type=jnp.float32,
                precision=matmul_precision(),
            )
    out_fm_ref[:] = acc_fm
    out_ca_ref[:] = acc_ca


@functools.partial(jax.jit, static_argnames=("stride", "tile", "interpret"))
def rulebook_gather_gemm_pallas_blocks(
    fm_hwc: jnp.ndarray,       # [Hp, Wp, C] padded featuremap (HWC)
    ca_hwc: jnp.ndarray,       # [Hp, Wp, C] padded conv-actfn (HWC)
    kernel_hwio: jnp.ndarray,  # [kh, kw, C, O]
    bias: jnp.ndarray,         # [O]
    by: jnp.ndarray,           # [K] block rows (site units)
    bx: jnp.ndarray,           # [K] block cols (BLOCK_W units)
    stride: int = 1,
    tile: int = 8,
    interpret: bool = False,
):
    """Returns ``(fm_vals, cact_vals)`` of shape ``[K, BLOCK_W, O]``."""
    if stride != 1:
        raise NotImplementedError("block rulebook requires stride 1")
    kh, kw, c, o = kernel_hwio.shape
    k = by.shape[0]
    if k % tile:
        pad = tile - k % tile
        by = jnp.concatenate([by, jnp.zeros(pad, by.dtype)])
        bx = jnp.concatenate([bx, jnp.zeros(pad, bx.dtype)])
    num_tiles = by.shape[0] // tile

    # lane-dim alignment (see pallas_rulebook.py)
    fm_hwc, ca_hwc, kernel_hwio, c = pad_lanes_128(
        fm_hwc, ca_hwc, kernel_hwio)
    # make sure a strip at the right edge stays in range
    strip_w = BLOCK_W + kw - 1
    wb = -(-(fm_hwc.shape[1] - (kw - 1)) // BLOCK_W)
    need_w = wb * BLOCK_W + kw - 1
    if fm_hwc.shape[1] < need_w:
        extra = need_w - fm_hwc.shape[1]
        fm_hwc = jnp.pad(fm_hwc, ((0, 0), (0, extra), (0, 0)))
        ca_hwc = jnp.pad(ca_hwc, ((0, 0), (0, extra), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile * BLOCK_W, o), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile * BLOCK_W, o), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, tile, kh, strip_w, c), jnp.float32),  # [buf, plane, ...]
            pltpu.SemaphoreType.DMA((2, 2, tile)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((num_tiles * tile * BLOCK_W, o), jnp.float32),
        jax.ShapeDtypeStruct((num_tiles * tile * BLOCK_W, o), jnp.float32),
    ]
    fm_vals, ca_vals = pl.pallas_call(
        functools.partial(_kernel, tile=tile, kh=kh, kw=kw),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(by.astype(jnp.int32), bx.astype(jnp.int32),
      fm_hwc.astype(jnp.float32), ca_hwc.astype(jnp.float32),
      kernel_hwio.astype(jnp.float32), bias.astype(jnp.float32))
    return (
        fm_vals[: k * BLOCK_W].reshape(k, BLOCK_W, o),
        ca_vals[: k * BLOCK_W].reshape(k, BLOCK_W, o),
    )
