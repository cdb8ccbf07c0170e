"""Space-to-depth fusion of a stride-1 3x3 conv + 2x2/2 max-pool pair.

The eFCN stem (/root/reference/src/models/frame_tf.py:86-108: conv1 is
3x3 over a 1-channel 160x224 surface, then 2x2 max-pool) is the worst
possible MXU shape when time-batched: the conv's contraction dimension is
K = 9*Cin (7% of a 128-wide MXU pass for Cin=1) and the [T, O, H, W]
conv output (459 MB at T=200) round-trips HBM just to be 4x-decimated by
the pool.

Space-to-depth re-blocks the SAME linear map: with the input's 2x2 pixel
phases moved into channels (``Z[c*4 + r*2 + s, u, v] = X[c, 2u+r, 2v+s]``),
every output pixel ``(2u+a, 2v+b)`` of the original conv is a 3x3 conv
tap-set over Z — so ONE conv of Z with a rearranged kernel
``[4*O, 4*Cin, 3, 3]`` produces all four pool phases at pool resolution:

  * contraction K grows 9*Cin -> 36*Cin and the output channels O -> 4*O
    (both 4x closer to the 128-wide MXU tile),
  * the conv output is already at H/2 x W/2, so the pool collapses to a
    ``max`` over the 4 phase channels — no full-resolution feature map
    ever touches HBM (8x less stem traffic at T=200),
  * exactness: the same dot products re-blocked (values match the direct
    conv to f32 summation-order rounding, ~1e-7 — far inside the 1e-4
    equivalence budget), and the phase-max IS the 2x2/2 VALID pool since
    leaky-ReLU is monotone, so ``pool(leaky(conv(x))) ==
    leaky-free-order(max over phases)`` exactly.

Measured on v5e (docs/performance.md round 3): the T-batched eFCN
stem pair drops ~2.9x, the whole headline step ~1.5x.

Applied per conv+pool pair in 'full' mode when the static MXU cost model
says it wins (thin early layers; deep layers keep the direct conv).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

from async_ev_cnn_tpu.ops.conv import leaky, matmul_precision


# Allow the fused pair at demoted matmul precision (bf16 / bf16x3).
# Rationale for relaxing the old HIGHEST-only gate: bf16 operand
# rounding is ELEMENTWISE, and s2d only permutes the operands (plus
# exact zero taps), so the fused contraction multiplies the identical
# bf16-rounded product set as the direct conv — the only difference is
# f32 accumulation order, the same ~1e-7 noise as at HIGHEST.
#
# MEASURED on v5e 2026-08-19 (examples/stem_bf16_retest.py): at the
# bf16 headline tier the fused-vs-direct parity is EXACTLY 0.0 over a
# 40-chunk scan, and the whole parallel-in-time step wins 1.15x
# (8.27/8.16M vs 7.14/7.11M ev/s, interleaved A/B, spread <= 0.03) —
# the bf16-tier step is HBM-bound and the fusion removes the network's
# largest activation round trip (conv1's full-resolution [T, 16, H, W]
# output).  Default True per that measurement.
#
# TRACE-TIME setting, like ops.conv.set_matmul_precision: the network
# gate reads it while tracing and it is not part of any jit cache key —
# toggling it after a program has compiled silently leaves that program
# at its old fused/unfused state (rebuild the network objects to apply).
allow_demoted_precision = True


def s2d_pair_applicable(conv_spec, pool_spec) -> bool:
    """Structural conditions for the fusion: stride-1 3x3 SAME conv over
    even spatial dims, followed by a 2x2 stride-2 pool, both 'full'."""
    _, h, w = conv_spec.in_shape
    return (
        conv_spec.mode == "full"
        and pool_spec.mode == "full"
        and conv_spec.stride == 1
        and tuple(conv_spec.ksize) == (3, 3)
        and conv_spec.padding == "SAME"
        and h % 2 == 0
        and w % 2 == 0
        and tuple(pool_spec.ksize) == (2, 2)
        and pool_spec.stride == 2
    )


def s2d_pair_wins(conv_spec) -> bool:
    """Fuse only TRUE stems: Cin <= 2 (a raw 1- or 2-channel surface).

    A tile-counting model (``M/4 * ceil(36*Cin/128) * ceil(4*O/128)`` vs
    the direct conv's tiles) predicted wins up to Cin=16, but the v5e
    measurement says otherwise: fusing eFCN's conv2+pool2 (Cin=16)
    REGRESSES the whole parallel step 11.9 -> 15.0 ms/dispatch at T=200
    while conv1+pool1 (Cin=1) measures neutral-to-slightly-positive
    (11.75 vs 11.88) — XLA's conv emitter handles K=144 well already and
    the s2d relayout/phase-max overhead dominates at K=576.  So the
    criterion is the measured one, not the model: only single-digit-Cin
    stems, where the direct conv's K=9*Cin contraction wastes >90% of an
    MXU pass and the full-resolution output materialization is the
    largest activation in the network."""
    return conv_spec.in_shape[0] <= 2


# tap index tables: DY[a, r, ey] = the original kernel row dy feeding
# output phase a from input phase r at s2d tap ey (3 = zero-pad slot)
_DY = np.full((2, 2, 3), 3, np.int32)
for _a in range(2):
    for _r in range(2):
        for _e in range(3):
            _dy = 2 * (_e - 1) + _r - _a + 1
            if 0 <= _dy < 3:
                _DY[_a, _r, _e] = _dy


def build_s2d_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """Rearrange an OIHW ``[O, Cin, 3, 3]`` kernel into the s2d kernel
    ``[4*O, 4*Cin, 3, 3]`` (out channel ``(a*2+b)*O + o``, in channel
    ``c*4 + r*2 + s``)."""
    o, cin, kh, kw = kernel.shape
    assert (kh, kw) == (3, 3)
    # pad a zero tap at index 3 for out-of-range (dy, dx)
    kp = jnp.pad(kernel, ((0, 0), (0, 0), (0, 1), (0, 1)))
    t1 = kp[:, :, _DY, :]       # [O, Cin, a, r, ey, 4]
    t2 = t1[..., _DY]           # [O, Cin, a, r, ey, b, s, ex]
    w2 = jnp.transpose(t2, (2, 5, 0, 1, 3, 6, 4, 7))  # a b O c r s ey ex
    return w2.reshape(4 * o, 4 * cin, 3, 3)


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """``[..., C, H, W] -> [..., C*4, H/2, W/2]`` with phase-minor channel
    order ``c*4 + r*2 + s``."""
    *lead, c, h, w = x.shape
    z = x.reshape(*lead, c, h // 2, 2, w // 2, 2)
    perm = list(range(len(lead))) + [
        len(lead), len(lead) + 2, len(lead) + 4, len(lead) + 1, len(lead) + 3
    ]
    z = jnp.transpose(z, perm)  # [..., c, r, s, u, v]
    return z.reshape(*lead, c * 4, h // 2, w // 2)


def fused_conv_pool(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, alpha: float
) -> jnp.ndarray:
    """``pool2x2(leaky(conv3x3_SAME(x) + bias))`` via space-to-depth.

    ``x`` is ``[C, H, W]`` (even H, W), ``kernel`` OIHW ``[O, C, 3, 3]``.
    Returns ``[O, H/2, W/2]``.
    """
    o = kernel.shape[0]
    z = space_to_depth(x)[None]  # [1, 4C, H/2, W/2]
    w2 = build_s2d_kernel(kernel)
    out = lax.conv_general_dilated(
        z.astype(jnp.float32),
        w2.astype(jnp.float32),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
        precision=matmul_precision(),
    )[0]
    out = out + jnp.tile(bias.astype(jnp.float32), 4).reshape(-1, 1, 1)
    out = leaky(out, alpha)
    h2, w2_ = out.shape[-2:]
    return jnp.max(out.reshape(4, o, h2, w2_), axis=0)
