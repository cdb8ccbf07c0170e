"""The full-recompute pool oracle must agree with the incremental pool's
featuremap at every step (it is the mid-step oracle for the recompute-set
logic, like the reference's unused MaxPoolLayerPartiallyEvent)."""

import numpy as np
import jax.numpy as jnp

from async_ev_cnn_tpu.layers.conv2d import ConvSpec, conv_init, conv_step
from async_ev_cnn_tpu.layers.integration import IntegrationSpec, integration_init, integration_step
from async_ev_cnn_tpu.layers.maxpool import (
    PoolSpec,
    pool_init,
    pool_step,
    pool_step_full_recompute,
)
from async_ev_cnn_tpu.utils.equivalence import make_stream


def test_pool_variants_agree(rng):
    ispec = IntegrationSpec(0.05, 12, 12)
    cspec = ConvSpec((1, 12, 12), 4, (3, 3), 1, 0.1, "SAME")
    pspec = PoolSpec(cspec.out_shape, (2, 2), 2)
    kernel = jnp.asarray(rng.randn(4, 1, 3, 3).astype(np.float32) * 0.5)
    bias = jnp.asarray(rng.randn(4).astype(np.float32) * 0.1)

    ist, iio = integration_init(ispec)
    cst, cio = conv_init(cspec, kernel, bias, iio)
    pst_a, _ = pool_init(pspec, cio)
    pst_b, _ = pool_init(pspec, cio)

    chunks = make_stream(rng, steps=200, events_per_step=4, h=12, w=12)
    for t in range(200):
        chunk = type(chunks)(*(a[t] for a in chunks))
        ist, iio, dl = integration_step(ispec, ist, chunk)
        cst, cio = conv_step(cspec, kernel, bias, cst, iio, dl)
        pst_a, io_a = pool_step(pspec, pst_a, cio, dl)
        pst_b, io_b = pool_step_full_recompute(pspec, pst_b, cio, dl)
        np.testing.assert_allclose(
            np.asarray(io_a.featuremap), np.asarray(io_b.featuremap), atol=1e-5,
            err_msg=f"step {t}",
        )
