"""Async-vs-dense equivalence harness.

TPU-native rebuild of the reference's differential test
(/root/reference/src/scripts/test_correctness.py): run the stateful async
network and the dense oracle in lockstep on the same synthetic event stream
and compare per-layer feature maps at every step.

Everything — both networks, the frame integrator, and the per-layer diff
reduction — is fused into one jitted ``lax.scan`` over the pre-generated
chunks, so a 10k-step correctness run is one XLA program instead of 10k
Python round trips.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from async_ev_cnn_tpu.layers.network import EventNetwork, dense_forward
from async_ev_cnn_tpu.layers.types import EventChunk
from async_ev_cnn_tpu.ops.integrate import integrate_step


class EquivalenceReport(NamedTuple):
    max_diff: "OrderedDict[str, float]"  # per layer, max over all steps
    worst_step: "OrderedDict[str, int]"


def make_stream(
    rng: np.random.RandomState,
    steps: int,
    events_per_step: int,
    h: int,
    w: int,
    max_dt: int = 10,
    clustered: bool = False,
    cluster_radius: int = 4,
    random_polarity: bool = False,
) -> EventChunk:
    """Synthetic stream like test_correctness.py:164-169: each step has
    ``events_per_step`` random events with sorted, strictly-advancing ts.

    ``clustered=True`` emits events around a slowly drifting center instead
    of uniformly — the spatial statistics of real DVS streams (object edges)
    and the regime the 'window' conv mode targets.
    """
    ts_steps = []
    prev = 0
    for _ in range(steps):
        ts = np.sort(rng.randint(1, max_dt, size=events_per_step)) + prev
        prev = int(ts[-1])
        ts_steps.append(ts)
    ts = np.stack(ts_steps).astype(np.int32)
    if clustered:
        cy = (h / 2 + h / 3 * np.sin(np.arange(steps) * 0.05))[:, None]
        cx = (w / 2 + w / 3 * np.cos(np.arange(steps) * 0.04))[:, None]
        y = np.clip(np.round(cy + rng.randn(steps, events_per_step) * cluster_radius), 0, h - 1)
        x = np.clip(np.round(cx + rng.randn(steps, events_per_step) * cluster_radius), 0, w - 1)
        y = y.astype(np.int32)
        x = x.astype(np.int32)
    else:
        y = rng.randint(0, h, size=(steps, events_per_step)).astype(np.int32)
        x = rng.randint(0, w, size=(steps, events_per_step)).astype(np.int32)
    p = (rng.randint(0, 2, size=(steps, events_per_step)).astype(np.int32)
         if random_polarity else np.zeros_like(y))
    valid = np.ones((steps, events_per_step), bool)
    return EventChunk(
        y=jnp.asarray(y), x=jnp.asarray(x), ts=jnp.asarray(ts),
        p=jnp.asarray(p), valid=jnp.asarray(valid),
    )


def run_equivalence(
    net: EventNetwork,
    params,
    chunks: EventChunk,
    dense_variant: str = "tf",
) -> EquivalenceReport:
    """Lockstep comparison; returns per-layer max |async - dense| diffs.

    The dense side integrates its own frame (ops/integrate.py) and runs the
    dense oracle on it each step, exactly like test_correctness.py:129-140.
    """
    ispec = net.event_layers[0].spec
    layer_names = [ld.name for ld in net.event_layers]

    def body(carry, chunk):
        state, frame, prev_ts = carry
        state, ios = net.forward(params, state, chunk)
        if ispec.channels == 1:
            f2, prev_ts, _, _ = integrate_step(
                frame[0], prev_ts, chunk.y, chunk.x, chunk.ts, chunk.valid,
                ispec.leak,
            )
            frame = f2[None]
        else:
            frame, prev_ts, _, _ = integrate_step(
                frame, prev_ts, chunk.y, chunk.x, chunk.ts, chunk.valid,
                ispec.leak, p=chunk.p,
            )
        dense = dense_forward(net.event_layers, params, frame, dense_variant,
                              alpha=net.alpha)
        diffs = jnp.stack(
            [jnp.max(jnp.abs(ios[n].featuremap - dense[n])) for n in layer_names]
        )
        return (state, frame, prev_ts), diffs

    def run(c):
        # init INSIDE the jit: its conv/pool chain would otherwise
        # dispatch eagerly — ~50 s/op on the tunneled TPU backend
        init = (
            net.init_state(params),
            jnp.zeros(ispec.out_shape, jnp.float32),
            jnp.int32(0),
        )
        return jax.lax.scan(body, init, c)

    _, diffs = jax.jit(run)(chunks)
    diffs = np.asarray(diffs)  # [steps, n_layers]
    report = EquivalenceReport(OrderedDict(), OrderedDict())
    for i, n in enumerate(layer_names):
        report.max_diff[n] = float(diffs[:, i].max())
        report.worst_step[n] = int(diffs[:, i].argmax())
    return report
