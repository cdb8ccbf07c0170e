"""Microbenchmark: what does one HBM->VMEM DMA descriptor really cost, and
how do strided box copies decompose?

Answers the question ROADMAP.md left open after the sparse-gather work:
the site-granular Pallas kernels all hit a ~4.5 ms floor at 1024 sites
regardless of descriptor shape, consistent with a fixed ~2.8 us cost per
issued DMA — but *which* unit is "a DMA" for a strided 3-D box copy
``[kh, w, C]``?  If the hardware expands it into ``kh`` per-row
descriptors (rows are contiguous in HWC layout), then box copies can never
beat explicitly issued row copies, and descriptor *count* — not byte
volume or rectangularity — is the design currency.

Method: one Pallas kernel issues ``n_copies`` copies per grid step (each
grid step at different offsets), in one of four shapes of identical byte
volume:

  flat    one contiguous ``[kh*w*C]`` slab          (1 descriptor if flat)
  rows    ``kh`` separate contiguous ``[w, C]`` row slabs   (kh issues)
  box     one strided ``[kh, w, C]`` box                    (1 issue)

each at ``kh = 3`` and ``kh = 8`` (same w*C row size), so the per-copy
cost as a function of the strided-row count separates "per-box descriptor"
from "per-row descriptor" models.  A fifth variant — lane-sliced rows
``[.., .., :C//2]`` — is rejected by Mosaic outright ("slice shape must be
aligned to tiling (128)"): sub-tile minor-dim copies are not expressible,
which already rules out column-subset gathering at the DMA level.

Per-copy cost is extracted as a *slope*: time grids of G and 2G steps and
difference, which cancels both the tunnel RTT and kernel launch overhead.

Run on the real chip:  python examples/dma_microbench.py
(CPU `--interpret` mode checks semantics only, timings are meaningless.)

Result (v5e, 2026-08-16, recorded in docs/performance.md): with 8 copies
in flight, flat / strided-box / explicit-rows / random scalar-prefetch
addresses are ALL equivalent at 360-550 GB/s for 48-128 KB copies built
from >=16 KB rows (~0.03-0.05 us marginal per 16 KB row), and even the
small-box ``box_sm`` geometry ([3, 8, 128] = 4 KB rows, the shape of a
receptive-field patch gather) measures ~0.09 us/copy at 140-350 GB/s.
There is NO fixed per-descriptor cost in any regime this harness can
reach — the round-2 "~2.8 us per-DMA floor" model does not reproduce,
and the shipped site-granular kernels' ~2.5 ms at 1024 sites is NOT the
gather DMAs (see docs/performance.md for the follow-up attribution).
One Mosaic restriction found while building this: sub-128-lane
minor-dim copies are a compile error ("Slice shape must be aligned to
tiling (128)"), so C=64 feature planes must be padded or paired to a
128-lane minor dim before per-site gathering.  (An earlier revision
recorded a "narrow-box runtime DMA crash" — that was this harness's own
bug: its wait loop re-started DMAs with stale offsets and never waited.)
"""

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_SITES = 16384
KH, WCOPY, C = 3, 32, 128  # one copy = 3*32*128 f32 = 48 KB; C = one full
# 128-lane tile (Mosaic rejects sub-tile minor-dim slices), and the flat
# variant's 12288 elements are 1024-aligned as 1-D VMEM slices must be
H, W = 516, 648


def _kernel(ys_ref, xs_ref, src_hbm, flat_hbm, out_ref, scratch,
            sems, *, n_copies, shape, kh):
    i = pl.program_id(0)
    sz = kh * WCOPY * C
    for t in range(n_copies):
        j = i * n_copies + t
        if shape in ("box_sp", "rows_sp"):
            # data-dependent addresses from the scalar-prefetch arrays —
            # the regime every rulebook gather actually lives in
            jj = jax.lax.rem(jnp.int32(j), jnp.int32(N_SITES))
            y0 = ys_ref[jj]
            x0 = xs_ref[jj]
        else:
            y0 = (j * 7) % (H - kh)
            x0 = (j * 13) % (W - WCOPY)
        if shape == "flat":
            n_blk = (H * W * C - sz) // 1024
            off = ((j * 37) % n_blk) * 1024
            pltpu.make_async_copy(
                flat_hbm.at[pl.ds(off, sz)],
                scratch.at[pl.ds(t * sz, sz)],
                sems.at[t],
            ).start()
        elif shape in ("box", "box_sp"):
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(y0, kh), pl.ds(x0, WCOPY), :],
                scratch.at[t],
                sems.at[t],
            ).start()
        elif shape in ("rows", "rows_sp"):
            for r in range(kh):
                pltpu.make_async_copy(
                    src_hbm.at[y0 + r, pl.ds(x0, WCOPY), :],
                    scratch.at[t, r],
                    sems.at[t, r],
                ).start()
        elif shape == "box_sm":
            # small rows: [kh, 8, 128] box -> kh transfers of 4 KB each,
            # close to the per-site 3x3xC receptive-field gather geometry
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(y0, kh), pl.ds(x0, 8), :],
                scratch.at[t],
                sems.at[t],
            ).start()
    for t in range(n_copies):
        if shape in ("rows", "rows_sp"):
            for r in range(kh):
                pltpu.make_async_copy(
                    src_hbm.at[0, pl.ds(0, WCOPY), :],
                    scratch.at[t, r],
                    sems.at[t, r],
                ).wait()
        elif shape == "box_sm":
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(0, kh), pl.ds(0, 8), :],
                scratch.at[t],
                sems.at[t],
            ).wait()
        elif shape == "flat":
            pltpu.make_async_copy(
                flat_hbm.at[pl.ds(0, sz)],
                scratch.at[pl.ds(t * sz, sz)],
                sems.at[t],
            ).wait()
        else:
            pltpu.make_async_copy(
                src_hbm.at[pl.ds(0, kh), pl.ds(0, WCOPY), :],
                scratch.at[t],
                sems.at[t],
            ).wait()
    # consume one lane so the copies cannot be elided
    @pl.when(i == 0)
    def _init():
        out_ref[0, :] = jnp.zeros((C,), jnp.float32)

    if shape == "flat":
        out_ref[0, :] = out_ref[0, :] + scratch[:C]
    else:
        out_ref[0, :] = out_ref[0, :] + scratch[0, 0, 0, :]


@functools.partial(jax.jit, static_argnames=("grid", "n_copies", "shape", "kh", "interpret"))
def run(src, flat, ys, xs, grid, n_copies, shape, kh=KH, interpret=False):
    sem_shape = (n_copies, kh) if shape.startswith("rows") else (n_copies,)
    if shape == "flat":
        scratch_shape = (n_copies * kh * WCOPY * C,)
    elif shape == "box_sm":
        scratch_shape = (n_copies, kh, 8, C)
    elif shape == "box64":
        scratch_shape = (n_copies, kh, 2 * WCOPY, C // 2)
    else:
        scratch_shape = (n_copies, kh, WCOPY, C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((1, C), lambda i, *_: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM(scratch_shape, jnp.float32),
            pltpu.SemaphoreType.DMA(sem_shape),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, n_copies=n_copies, shape=shape, kh=kh),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, C), jnp.float32),
        interpret=interpret,
    )(ys, xs, src, flat)


def time_grid(src, flat, ys, xs, grid, n_copies, shape, kh):
    f = lambda: np.asarray(run(src, flat, ys, xs, grid, n_copies, shape, kh))
    f()  # compile + warm
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true", help="CPU semantics check")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    src = jnp.asarray(rng.rand(H, W, C).astype(np.float32))
    flat = src.reshape(-1)
    ys = jnp.asarray(rng.randint(0, H - 8, N_SITES), jnp.int32)
    xs = jnp.asarray(rng.randint(0, W - WCOPY, N_SITES), jnp.int32)

    if args.interpret:
        for shape in ("flat", "box", "rows", "box_sp", "rows_sp", "box_sm"):
            for kh in (3, 8):
                out = np.asarray(run(src, flat, ys, xs, 4, 2, shape, kh,
                                     interpret=True))
                assert np.isfinite(out).all(), (shape, kh)
        print("interpret-mode semantics OK")
        return

    # slope between 33k and 131k copies: the extra ~100k copies dwarf the
    # tunnel's RTT jitter even at ~0.1 us/copy
    n_copies, g1, g2 = 8, 4096, 16384
    print(f"row = [{WCOPY}, {C}] f32 = {WCOPY*C*4/1024:.0f} KB; "
          f"copy = kh rows (kh in 3, 8)")
    print(f"{'shape':8s} {'kh':>3s} {'us/copy':>8s} {'us/row':>7s} {'GB/s':>7s}")
    for shape in ("flat", "box", "rows", "box_sp", "rows_sp", "box_sm"):
        for kh in (3, 8):
            t1 = time_grid(src, flat, ys, xs, g1, n_copies, shape, kh)
            t2 = time_grid(src, flat, ys, xs, g2, n_copies, shape, kh)
            per = (t2 - t1) / ((g2 - g1) * n_copies)
            byt = kh * (8 if shape == "box_sm" else WCOPY) * C * 4
            print(f"{shape:8s} {kh:3d} {per*1e6:8.2f} {per*1e6/kh:7.2f} "
                  f"{byt/per/1e9:7.2f}   (t_g1={t1*1e3:.1f} ms t_g2={t2*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
