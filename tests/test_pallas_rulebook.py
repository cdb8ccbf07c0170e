"""Pallas rulebook gather+GEMM vs the XLA reference formulation.

Runs in interpret mode on CPU; the same code compiles natively on TPU.
"""

import numpy as np
import jax.numpy as jnp

from async_ev_cnn_tpu.ops.pallas_rulebook import rulebook_gather_gemm_pallas
from async_ev_cnn_tpu.ops.rulebook import gather_patches, patch_indices


def reference_vals(fm, ca, kernel_hwio, bias, ys, xs, stride):
    kh, kw, c, o = kernel_hwio.shape
    planes = jnp.stack([jnp.transpose(fm, (2, 0, 1)), jnp.transpose(ca, (2, 0, 1))])
    sp_idx = patch_indices(jnp.asarray(ys), jnp.asarray(xs), stride, (kh, kw), fm.shape[1])
    patches = gather_patches(planes, sp_idx)  # [2, K, C*kh*kw] in CHW patch order
    # reorder kernel to match CHW patch rows: [C, kh, kw] -> rows
    kmat = jnp.transpose(kernel_hwio, (2, 0, 1, 3)).reshape(c * kh * kw, o)
    out = jnp.einsum("nkd,do->nko", patches, kmat)
    return np.asarray(out[0] + bias), np.asarray(out[1])


def test_pallas_matches_xla(rng):
    hp, wp, c, o, kh, kw = 14, 18, 4, 8, 3, 3
    fm = rng.randn(hp, wp, c).astype(np.float32)
    ca = rng.randn(hp, wp, c).astype(np.float32)
    kern = rng.randn(kh, kw, c, o).astype(np.float32)
    bias = rng.randn(o).astype(np.float32)
    k = 24
    ys = rng.randint(0, hp - kh + 1, k).astype(np.int32)
    xs = rng.randint(0, wp - kw + 1, k).astype(np.int32)

    fm_vals, ca_vals = rulebook_gather_gemm_pallas(
        jnp.asarray(fm), jnp.asarray(ca), jnp.asarray(kern), jnp.asarray(bias),
        jnp.asarray(ys), jnp.asarray(xs), stride=1, tile=8, interpret=True,
    )
    exp_fm, exp_ca = reference_vals(fm, ca, kern, bias, ys, xs, 1)
    np.testing.assert_allclose(np.asarray(fm_vals), exp_fm, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ca_vals), exp_ca, rtol=1e-5, atol=1e-5)


def test_pallas_nondivisible_k(rng):
    hp, wp, c, o, kh, kw = 10, 10, 2, 4, 2, 2
    fm = rng.randn(hp, wp, c).astype(np.float32)
    ca = rng.randn(hp, wp, c).astype(np.float32)
    kern = rng.randn(kh, kw, c, o).astype(np.float32)
    bias = np.zeros(o, np.float32)
    k = 5  # not a multiple of the tile
    ys = rng.randint(0, hp - kh + 1, k).astype(np.int32)
    xs = rng.randint(0, wp - kw + 1, k).astype(np.int32)
    fm_vals, ca_vals = rulebook_gather_gemm_pallas(
        jnp.asarray(fm), jnp.asarray(ca), jnp.asarray(kern), jnp.asarray(bias),
        jnp.asarray(ys), jnp.asarray(xs), stride=1, tile=4, interpret=True,
    )
    assert fm_vals.shape == (5, o)
    exp_fm, exp_ca = reference_vals(fm, ca, kern, bias, ys, xs, 1)
    np.testing.assert_allclose(np.asarray(fm_vals), exp_fm, rtol=1e-5, atol=1e-5)


def test_pallas_matches_xla_stride2(rng):
    """stride > 1 is the ONLY production route to this per-site kernel
    (conv2d.py sends stride-1 sparse_pallas convs to the blocks kernel),
    yet it had never been executed by any test."""
    hp, wp, c, o, kh, kw = 17, 21, 3, 6, 3, 3
    stride = 2
    fm = rng.randn(hp, wp, c).astype(np.float32)
    ca = rng.randn(hp, wp, c).astype(np.float32)
    kern = rng.randn(kh, kw, c, o).astype(np.float32)
    bias = rng.randn(o).astype(np.float32)
    oh = (hp - kh) // stride + 1
    ow = (wp - kw) // stride + 1
    k = 12
    ys = rng.randint(0, oh, k).astype(np.int32)
    xs = rng.randint(0, ow, k).astype(np.int32)
    fm_vals, ca_vals = rulebook_gather_gemm_pallas(
        jnp.asarray(fm), jnp.asarray(ca), jnp.asarray(kern), jnp.asarray(bias),
        jnp.asarray(ys), jnp.asarray(xs), stride=stride, tile=4,
        interpret=True,
    )
    exp_fm, exp_ca = reference_vals(fm, ca, kern, bias, ys, xs, stride)
    np.testing.assert_allclose(np.asarray(fm_vals), exp_fm, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ca_vals), exp_ca, rtol=1e-5, atol=1e-5)
