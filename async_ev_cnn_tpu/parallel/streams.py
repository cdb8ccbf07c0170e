"""Multi-stream sharded serving over a device mesh.

The reference is single-process, single-core, batch-size-1
(/root/reference/configs/efcn_event.yml; SURVEY.md SS2.6) — its only
concurrency is reader worker processes.  The TPU-native scale-out story for
this capability set is:

* **data parallelism over event streams** (axis ``data``): each device owns
  complete streams — state at chunk t depends on chunk t-1, so the sequence
  axis itself cannot be split, but independent streams shard perfectly with
  zero cross-device traffic;
* **tensor parallelism over channels** (axis ``model``, optional): conv
  kernels are sharded on output channels, layer state on its channel axis;
  XLA GSPMD inserts the (all-gather on the kernel's input-channel axis /
  reduce over channels for the event masks) collectives over ICI.

Weights are replicated over ``data`` and sharded over ``model``; stream
state and event chunks are sharded over ``data``.  Everything is expressed
with ``jax.sharding.NamedSharding`` on one jitted step — no hand-written
collectives.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from async_ev_cnn_tpu.layers.network import EventNetwork
from async_ev_cnn_tpu.layers.types import (
    ConvState,
    EventChunk,
    IntegrationState,
    PoolState,
)


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a ``(data, model)`` mesh from the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_model < 1 or n_model > devices.size:
        raise ValueError(
            f"n_model={n_model} does not fit {devices.size} device(s)"
        )
    if n_data is None:
        n_data = devices.size // n_model
    if n_data < 1:
        raise ValueError(
            f"mesh would have a zero-size data axis ({devices.size} "
            f"device(s) / n_model={n_model})"
        )
    if n_data * n_model != devices.size:
        devices = devices[: n_data * n_model]
    return Mesh(devices.reshape(n_data, n_model), axis_names=("data", "model"))


class MultiStreamEngine:
    """Batches independent event streams over a mesh.

    State/chunks carry a leading stream axis (sharded over ``data``); conv
    weights/state shard their output-channel axis over ``model``.
    """

    def __init__(self, net: EventNetwork, mesh: Mesh):
        self.net = net
        self.mesh = mesh
        self._jit_step = None
        self._jit_scan = None
        self._jit_scan_parallel = {}

    # ---- shardings --------------------------------------------------------

    def _sh(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    def param_shardings(self, params):
        out = {}
        for k in params:
            if k.startswith("w_conv"):
                # HWIO: shard O over 'model'
                out[k] = self._sh(None, None, None, "model")
            elif k.startswith("b_conv"):
                out[k] = self._sh("model")
            else:
                out[k] = self._sh()
        return out

    def state_shardings(self):
        """Shardings for the stream-batched state pytree.  Full-mode layers
        keep scalar placeholder state (rank 1 after stream batching), so
        they shard over ``data`` only."""
        shardings = []
        for ld in self.net.event_layers:
            if ld.kind == "intgr":
                shardings.append(IntegrationState(self._sh("data"), self._sh("data")))
            elif ld.kind == "conv":
                if ld.spec.mode == "full":
                    shardings.append(ConvState(self._sh("data"), self._sh("data")))
                else:
                    shardings.append(
                        ConvState(
                            self._sh("data", "model"), self._sh("data", "model")
                        )
                    )
            else:  # pool
                if ld.spec.mode == "full":
                    shardings.append(PoolState(self._sh("data"), self._sh("data")))
                else:
                    shardings.append(
                        PoolState(self._sh("data", "model"), self._sh("data"))
                    )
        return tuple(shardings)

    def chunk_sharding(self, leading_time: bool = False):
        """[S, E] chunks shard axis 0; [T, S, E] chunks shard axis 1."""
        s = self._sh(None, "data") if leading_time else self._sh("data")
        return EventChunk(s, s, s, s, s)

    # ---- state ------------------------------------------------------------

    def init_states(self, params, n_streams: int):
        """Replicated-init state broadcast over the stream axis, placed with
        the stream shardings."""
        n_data = self.mesh.shape["data"]
        if n_streams % n_data:
            # fail with the real constraint, not a deep NamedSharding
            # 'dimension not divisible' error
            raise ValueError(
                f"n_streams={n_streams} must be divisible by the mesh's "
                f"data axis ({n_data})"
            )
        base = self.net.init_state(params)
        batched = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_streams, *x.shape)), base
        )
        return jax.device_put(batched, self.state_shardings())

    def place_params(self, params):
        params = {k: jnp.asarray(v) for k, v in params.items()}
        return jax.device_put(params, self.param_shardings(params))

    def place_chunks(self, chunks: EventChunk, leading_time: bool = False):
        return jax.device_put(chunks, self.chunk_sharding(leading_time))

    # ---- compute ----------------------------------------------------------

    def _build(self):
        net = self.net

        def step(params, states, chunks):
            def one(state, chunk):
                state, out = net.step(params, state, chunk)
                return state, out

            return jax.vmap(one, in_axes=(0, 0))(states, chunks)

        out_sh = (self.state_shardings(), self._sh("data"))
        self._jit_step = jax.jit(
            step,
            in_shardings=(None, self.state_shardings(), self.chunk_sharding()),
            out_shardings=out_sh,
        )

        def scan(params, states, chunks):
            # chunks: [T, S, E] — scan over T, vmap over S
            def body(st, chunk):
                def one(state, c):
                    state, out = net.step(params, state, c)
                    return state, out

                return jax.vmap(one)(st, chunk)

            return jax.lax.scan(body, states, chunks)

        self._jit_scan = jax.jit(
            scan,
            in_shardings=(None, self.state_shardings(), self.chunk_sharding(True)),
            out_shardings=(self.state_shardings(), self._sh(None, "data")),
        )

    def step(self, params, states, chunks: EventChunk):
        """One micro-batch for every stream: ``chunks`` leaves are [S, E]."""
        if self._jit_step is None:
            self._build()
        return self._jit_step(params, states, chunks)

    def scan(self, params, states, chunks: EventChunk):
        """T micro-batches for every stream: ``chunks`` leaves are [T, S, E]."""
        if self._jit_scan is None:
            self._build()
        return self._jit_scan(params, states, chunks)

    def scan_parallel(self, params, states, chunks: EventChunk,
                      window: int | None = 256):
        """Parallel-in-time serving: every stream runs
        :meth:`EventNetwork.scan_parallel` (time-batched forward), vmapped
        over the stream axis and sharded over ``data`` — the whole mesh
        computes one ``[T * S_local]``-frame batched program per device.
        Requires an all-'full' network; ``chunks`` leaves are [T, S, E].
        ``window`` caps frames-per-dispatch per stream (activation memory
        scales with T * S_local; the tail pads with exact no-op chunks)."""
        if window not in self._jit_scan_parallel:
            net = self.net

            def scan_par(params, states, chunks):
                def one(state, cs):  # cs leaves [T, E]
                    return net.scan_parallel(params, state, cs, window=window)

                return jax.vmap(one, in_axes=(0, 1), out_axes=(0, 1))(
                    states, chunks
                )

            self._jit_scan_parallel[window] = jax.jit(
                scan_par,
                in_shardings=(
                    None, self.state_shardings(), self.chunk_sharding(True)
                ),
                out_shardings=(self.state_shardings(), self._sh(None, "data")),
            )
        return self._jit_scan_parallel[window](params, states, chunks)
