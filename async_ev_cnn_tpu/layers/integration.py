"""Leaky-surface input layer (functional).

Stateful-layer contract, TPU style: a static ``Spec`` plus pure
``init``/``step`` functions over pytree state.  Semantics mirror
/root/reference/src/layers/integration.py:6-95.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from async_ev_cnn_tpu.layers.types import EventChunk, IntegrationState, LayerIO
from async_ev_cnn_tpu.ops.integrate import integrate_step


class IntegrationSpec(NamedTuple):
    leak: float
    h: int
    w: int
    channels: int = 1  # 1 = polarity dropped (reference); 2 = ON/OFF channels

    @property
    def out_shape(self) -> tuple[int, int, int]:
        return (self.channels, self.h, self.w)


def _make_io(surface: jnp.ndarray, mask: jnp.ndarray) -> LayerIO:
    # layer_actfn == conv_actfn == (surface > 0) (integration.py:33-43).
    actfn = (surface > 0).astype(jnp.float32)
    return LayerIO(surface=surface, layer_actfn=actfn, conv_actfn=actfn, mask=mask)


def integration_init(spec: IntegrationSpec) -> tuple[IntegrationState, LayerIO]:
    surface = jnp.zeros(spec.out_shape, jnp.float32)
    state = IntegrationState(surface=surface, prev_ts=jnp.int32(0))
    return state, _make_io(surface, jnp.zeros((spec.h, spec.w), bool))


def integration_step(
    spec: IntegrationSpec, state: IntegrationState, chunk: EventChunk
) -> tuple[IntegrationState, LayerIO, jnp.ndarray]:
    """Integrate one chunk; returns ``(state, io, delta_leak)``."""
    if spec.channels == 1:
        surface, last_ts, out_mask, delta_leak = integrate_step(
            state.surface[0], state.prev_ts,
            chunk.y, chunk.x, chunk.ts, chunk.valid, spec.leak,
        )
        surface = surface[None]
    else:
        surface, last_ts, out_mask, delta_leak = integrate_step(
            state.surface, state.prev_ts,
            chunk.y, chunk.x, chunk.ts, chunk.valid, spec.leak, p=chunk.p,
        )
    return IntegrationState(surface, last_ts), _make_io(surface, out_mask), delta_leak
