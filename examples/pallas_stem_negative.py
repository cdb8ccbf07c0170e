"""Fused stem kernel (conv1 3x3 C_in=1 + leaky + maxpool 2x2) — a recorded
NEGATIVE result.

Motivation: in the parallel-in-time step the batched stem costs ~2 ms of
the ~9.6 ms dispatch (T=200 @ 160x224), and XLA materializes the [T, 16,
160, 224] conv output to HBM only for the pool to re-read it (~1 GB of
traffic per dispatch).  A fused Pallas kernel avoids that round trip:
per-frame blocks (143 KB in, 573 KB out — comfortably in the DMA
streaming regime per examples/dma_microbench.py), 9 shifted VPU FMAs per
output channel from a zero-padded VMEM staging buffer, then the pool.

Measured (v5e, T=200, K=10-chained with ~2.9 ms RTT share): XLA
conv+leaky+reduce_window 4.98 ms/call vs this kernel 7.85 ms/call —
the kernel LOSES ~2.4x ex-RTT (2.1 vs 5.0 ms).  The VPU tap loop
(16 channels x 9 taps, serial 2-D passes) plus the lane-dim pooling
workarounds cost more than the HBM round trip they save; XLA's conv
emitter is simply better at this shape.  Kept because the Mosaic
patterns here are reusable:

* strided slices (``acc[0::2, 0::2]`` or ``lax.slice`` with strides) do
  NOT lower — neither gather nor extract_strided_slice with stride 2 is
  supported;
* H-direction (sublane) pooling works as a sublane-only reshape + max;
* W-direction (lane) pooling works as ``max(m, roll(m, -1))`` followed by
  an even-lane select expressed as an exact one-hot matmul (pin
  ``Precision.HIGHEST`` — at default precision the select rounds its
  operand to bf16, ~2e-3 error).

Correctness: matches the XLA reference to 1.5e-7 on hardware (FMA
ordering differences only).  Run ``--interpret`` for the CPU check.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stem_kernel(x_ref, w_ref, b_ref, sel_ref, out_ref, padbuf, *, h, w, n_out, alpha):
    # x_ref: [1, h, w] VMEM; w_ref: [16(pad rows), 16?]... w taps in SMEM-ish VMEM [9, O]
    # padbuf: [h+2, w+2] VMEM zero-padded staging
    padbuf[...] = jnp.zeros_like(padbuf)
    padbuf[1:h+1, 1:w+1] = x_ref[0]
    for o in range(n_out):
        acc = jnp.full((h, w), 0.0, jnp.float32) + b_ref[0, o]
        for dy in range(3):
            for dx in range(3):
                acc = acc + padbuf[dy:dy+h, dx:dx+w] * w_ref[dy * 3 + dx, o]
        acc = jnp.where(acc > 0, acc, alpha * acc)
        # H-pool: sublane-only reshape (lanes untouched) + max
        m = jnp.max(acc.reshape(h // 2, 2, w), axis=1)          # [h/2, w]
        # W-pool: pair-max into even lanes, then even-lane select as an
        # exact one-hot matmul (strided lane slices are not expressible)
        mw = jnp.maximum(m, jnp.roll(m, -1, axis=1))            # [h/2, w]
        pooled = jnp.dot(mw, sel_ref[...],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)   # [h/2, w/2]
        out_ref[0, o] = pooled


@functools.partial(jax.jit, static_argnames=("w",))
def _even_select_impl(w):
    cols = jax.lax.broadcasted_iota(jnp.int32, (w, w // 2), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (w, w // 2), 0)
    return (rows == 2 * cols).astype(jnp.float32)


def _even_select(w):
    return _even_select_impl(w)


@functools.partial(jax.jit, static_argnames=("alpha", "interpret"))
def fused_stem(x, w_taps, bias, alpha=0.1, interpret=False):
    """x: [T, H, W] f32; w_taps: [9, O]; bias: [O] -> [T, O, H//2, W//2]."""
    t, h, ww = x.shape
    o = w_taps.shape[1]
    return pl.pallas_call(
        functools.partial(_stem_kernel, h=h, w=ww, n_out=o, alpha=alpha),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, h, ww), lambda i: (i, 0, 0)),
            pl.BlockSpec((9, o), lambda i: (0, 0)),
            pl.BlockSpec((1, o), lambda i: (0, 0)),
            pl.BlockSpec((x.shape[2], x.shape[2] // 2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, o, h // 2, ww // 2), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, o, h // 2, ww // 2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h + 2, ww + 2), jnp.float32)],
        interpret=interpret,
    )(x, w_taps, bias[None], _even_select(ww))


if __name__ == "__main__":
    from jax import lax
    T, H, W, O = 8, 160, 224, 16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(T, H, W).astype(np.float32))
    k = jnp.asarray(rng.randn(O, 1, 3, 3).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(O).astype(np.float32) * 0.1)
    w_taps = jnp.transpose(k[:, 0], (1, 2, 0)).reshape(9, O)

    def ref(xx):
        c = lax.conv_general_dilated(xx[:, None], k, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=lax.Precision.HIGHEST) + b[None, :, None, None]
        c = jnp.where(c > 0, c, 0.1 * c)
        return lax.reduce_window(c, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")

    import sys
    interp = "--interpret" in sys.argv
    got = fused_stem(x, w_taps, b, interpret=interp)
    want = ref(x)
    print("maxdiff:", float(jnp.max(jnp.abs(got - want))))
