"""Interpret-mode correctness for the row-granular Pallas kernel
(ops/pallas_rows.py) against the dense NHWC conv."""

import numpy as np
import jax.numpy as jnp
from jax import lax

from async_ev_cnn_tpu.ops.pallas_rows import rows_gather_conv_pallas


def test_rows_gather_conv_matches_dense(rng):
    h, w, c, o, kh, kw = 24, 20, 5, 7, 3, 3
    fm = jnp.asarray(rng.rand(h + 2, w + 2, c).astype(np.float32))
    ca = jnp.asarray(rng.rand(h + 2, w + 2, c).astype(np.float32))
    k = jnp.asarray(rng.randn(kh, kw, c, o).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(o).astype(np.float32) * 0.1)
    rows = jnp.asarray([0, 3, 7, 20], jnp.int32)

    fr, cr = rows_gather_conv_pallas(fm, ca, k, b, rows, interpret=True)
    ref = lax.conv_general_dilated(
        jnp.stack([fm, ca]), k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    ref_fm = ref[0] + b
    for i, r in enumerate(np.asarray(rows)):
        np.testing.assert_allclose(fr[i], ref_fm[r], atol=1e-5)
        np.testing.assert_allclose(cr[i], ref[1][r], atol=1e-5)
