"""The CPU coordinate-list async engine must track the JAX async network —
oracle triangulation: numpy-lists vs jax-masks vs dense."""

from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp

from async_ev_cnn_tpu.layers.network import EventNetwork
from async_ev_cnn_tpu.models.event_numpy_cpu import AsyncEventNumpy
from async_ev_cnn_tpu.utils.equivalence import make_stream


def test_cpu_async_matches_jax_async(rng):
    layer_defs = OrderedDict(
        [("conv1", [3, 3, 1, 4]), ("pool1", [2, 2]), ("conv2", [3, 3, 4, 6]), ("pool2", [2, 2])]
    )
    params = {
        "w_conv1": rng.randn(3, 3, 1, 4).astype(np.float32) * 0.4,
        "b_conv1": rng.randn(4).astype(np.float32) * 0.1,
        "w_conv2": rng.randn(3, 3, 4, 6).astype(np.float32) * 0.4,
        "b_conv2": rng.randn(6).astype(np.float32) * 0.1,
    }
    h = w = 16
    leak = 0.05
    net = EventNetwork(layer_defs, h, w, leak=leak, alpha=0.1, padding="SAME")
    jparams = {k: jnp.asarray(v) for k, v in params.items()}
    state = net.init_state(jparams)
    cpu = AsyncEventNumpy(layer_defs, params, h, w, leak, alpha=0.1, padding="SAME")

    chunks = make_stream(rng, steps=150, events_per_step=5, h=h, w=w)
    fwd = jax.jit(net.forward)
    for t in range(150):
        chunk = jax.tree.map(lambda a: a[t], chunks)
        state, ios = fwd(jparams, state, chunk)
        events = np.stack([np.asarray(chunk.y), np.asarray(chunk.x),
                           np.asarray(chunk.ts)], -1)
        cpu_fm = cpu.step(events)
        jax_fm = np.asarray(next(reversed(ios.values())).featuremap)
        np.testing.assert_allclose(cpu_fm, jax_fm, atol=1e-4, err_msg=f"step {t}")


def test_cpu_async_reset(rng):
    layer_defs = OrderedDict([("conv1", [3, 3, 1, 2]), ("pool1", [2, 2])])
    params = {
        "w_conv1": rng.randn(3, 3, 1, 2).astype(np.float32),
        "b_conv1": rng.randn(2).astype(np.float32),
    }
    cpu = AsyncEventNumpy(layer_defs, params, 8, 8, 0.1)
    ev = np.array([[2, 3, 5], [4, 4, 9]], np.int64)
    a = cpu.step(ev).copy()
    cpu.reset()
    b = cpu.step(ev)
    np.testing.assert_array_equal(a, b)


def test_snap_grid_in_sync_with_numerics():
    """The CPU oracle hardcodes the 2**-20 snap grid (importing
    ops.numerics would pull jax into the pure-CPU module); this gate
    keeps the two constants from drifting apart."""
    from async_ev_cnn_tpu.models.event_numpy_cpu import _snap
    from async_ev_cnn_tpu.ops.numerics import SNAP_BITS

    v = np.float32(0.1234567)
    expected = np.float32(
        np.round(v * np.float32(2.0**SNAP_BITS)) * np.float32(2.0**-SNAP_BITS))
    assert _snap(v) == expected


def test_cpu_oracle_edge_chunks(rng):
    """Edge semantics must match integrate_step: an empty chunk is an
    exact no-op, a chunk older than prev_ts must not leak NEGATIVELY
    (it used to grow every pixel), and unsorted duplicate pixels take
    the (ts, index)-lexicographic winner."""
    from collections import OrderedDict

    from async_ev_cnn_tpu.models.event_numpy_cpu import AsyncEventNumpy

    layer_defs = OrderedDict(conv1=[3, 3, 1, 4])
    params = {
        "w_conv1": rng.randn(3, 3, 1, 4).astype(np.float32) * 0.3,
        "b_conv1": rng.randn(4).astype(np.float32) * 0.1,
    }
    m = AsyncEventNumpy(layer_defs, params, 6, 6, leak=0.01, alpha=0.1,
                        padding="SAME")
    m.step(np.array([[2, 2, 100]]))
    surf_after = m.surface.copy()
    out1 = m.step(np.zeros((0, 3), np.int32))  # empty: exact no-op
    np.testing.assert_array_equal(m.surface, surf_after)
    assert m.prev_ts == 100
    m.step(np.array([[3, 3, 50]]))  # older chunk: no negative leak
    assert m.prev_ts == 100
    assert (m.surface <= 1.0 + 1e-6).all()

    # unsorted duplicates: winner is the max-ts event
    m2 = AsyncEventNumpy(layer_defs, params, 6, 6, leak=0.01, alpha=0.1,
                         padding="SAME")
    m2.step(np.array([[3, 3, 90], [3, 3, 40]]))  # unsorted
    m3 = AsyncEventNumpy(layer_defs, params, 6, 6, leak=0.01, alpha=0.1,
                         padding="SAME")
    m3.step(np.array([[3, 3, 40], [3, 3, 90]]))  # sorted
    np.testing.assert_array_equal(m2.surface, m3.surface)
    assert m2.surface[3, 3] == np.float32(1.0)  # dt=0 winner
