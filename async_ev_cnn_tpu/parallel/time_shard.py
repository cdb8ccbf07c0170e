"""Sequence parallelism over the event-stream time axis.

The reference (and this repo's SURVEY §5) observed that the event stream's
sequence axis is "sequential by construction — state at chunk t depends on
t-1 — so cross-chip parallelism is over streams, not within a stream".
Parallel-in-time execution *breaks that constraint*: each chunk's surface
update is the max-plus affine map ``g[b, c](s) = max(s + b, c)``, closed
under composition (ops/integrate.py), so one stream's T chunks can be
sharded across D devices:

1. each device builds its local ``[T/D, C, H, W]`` coefficient pairs
   (``ops.integrate.chunk_affine_updates``) and scans them locally;
2. one tiny collective round composes the D per-device totals into
   exclusive device prefixes — ``all_gather`` of a ``(b, c)`` pair per
   device (2 * C*H*W floats, ~290 KB for eFCN) over ICI, then a static
   D-step masked composition;
3. each device offsets its local prefixes, reconstructs its T/D surfaces,
   and runs the time-batched network forward on them — perfectly
   data-parallel from here on.

Cross-device traffic is O(D * C*H*W) per dispatch, independent of T —
negligible next to the O(T/D * network) local compute, so the speedup is
essentially linear in D for large T.  The global timestamp chain is exact
(integer max); the (b, c) composition regroups float adds/maxes relative
to the single-device ``associative_scan`` tree, so outputs match
``EventNetwork.scan_parallel`` to the usual regrouping tolerance (~1e-6,
gated in tests/test_parallel.py), and both match the sequential
``EventNetwork.scan`` within the 1e-4 contract.

No reference analog (single-core inference, SURVEY §2.6) — this is the
"sequence parallelism" row of the TPU-native scale-out story: dp = streams
(parallel/streams.py), tp = conv channels (ibid.), sp = this module.
``TimeShardEngine`` also composes dp x sp on a 2-D ``(data, time)`` mesh:
streams shard over ``data`` with zero cross-stream traffic, and each
stream's chunk axis shards over ``time`` with the prefix-composition
collectives riding only that axis.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from async_ev_cnn_tpu.layers.network import EventNetwork
from async_ev_cnn_tpu.layers.types import EventChunk, IntegrationState
from async_ev_cnn_tpu.ops.integrate import (
    TS_SENTINEL,
    chunk_affine_updates,
    maxplus_combine,
)


def make_time_mesh(n_devices: int | None = None, devices=None,
                   n_streams: int = 1) -> Mesh:
    """A 1-D ``(time,)`` mesh, or a 2-D ``(data, time)`` mesh when
    ``n_streams`` > 1 (``n_streams`` data shards x remaining time shards)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if n_devices > devices.size:
            raise ValueError(
                f"requested {n_devices} devices but only {devices.size} available"
            )
        devices = devices[:n_devices]
    if n_streams > 1:
        if devices.size % n_streams:
            raise ValueError(
                f"{devices.size} devices not divisible by {n_streams} stream shards"
            )
        return Mesh(
            devices.reshape(n_streams, -1), axis_names=("data", "time")
        )
    return Mesh(devices, axis_names=("time",))


class TimeShardEngine:
    """Shards ONE stream's chunk axis over a mesh axis.

    Use when a single stream's throughput matters more than aggregate
    serving throughput (the streams engine covers that): D devices advance
    the same stream D times faster instead of serving D streams.
    Requires an all-'full' network (same precondition as
    ``EventNetwork.scan_parallel``).
    """

    def __init__(self, net: EventNetwork, mesh: Mesh, axis: str = "time",
                 stream_axis: str | None = None):
        """``stream_axis`` (e.g. ``"data"`` from a 2-D ``make_time_mesh``)
        additionally shards a leading stream axis of state/chunks — dp x sp
        composition; pass None (default) for the single-stream engine."""
        if not net.is_all_full:
            raise ValueError(
                "time sharding requires conv_mode='full' for every layer "
                "(same precondition as scan_parallel)"
            )
        if axis not in mesh.axis_names:
            raise ValueError(f"mesh has no axis {axis!r}: {mesh.axis_names}")
        if stream_axis is not None and stream_axis not in mesh.axis_names:
            raise ValueError(
                f"mesh has no axis {stream_axis!r}: {mesh.axis_names}"
            )
        self.net = net
        self.mesh = mesh
        self.axis = axis
        self.stream_axis = stream_axis
        self._jit = None

    def _local_fn(self, params, state, chunks: EventChunk):
        """Runs per device under shard_map: chunks leaves are [T/D, E]."""
        net, axis = self.net, self.axis
        d_axis = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        ispec = net.event_layers[0].spec
        surface, prev_ts = state[0].surface, state[0].prev_ts
        channels, h, w = surface.shape

        # -- global timestamp chain (exact integer maxes) -------------------
        chunk_max = jnp.max(
            jnp.where(chunks.valid, chunks.ts, TS_SENTINEL), axis=1
        ).astype(jnp.int32)
        dev_max = jax.lax.all_gather(jnp.max(chunk_max), axis)  # [D]
        mask_before = jnp.arange(d_axis) < idx
        incoming = jnp.maximum(
            prev_ts, jnp.max(jnp.where(mask_before, dev_max, TS_SENTINEL))
        ).astype(jnp.int32)

        # -- local coefficients + local prefix scan -------------------------
        b, c, last_ts = chunk_affine_updates(
            channels, h, w, incoming, chunks, ispec.leak
        )
        big_b, big_c = jax.lax.associative_scan(maxplus_combine, (b, c))

        # -- one collective round: compose the gathered device totals into
        #    (a) this device's EXCLUSIVE prefix (devices < idx) and (b) the
        #    full composition of all devices, in a single static pass
        tot = (jax.lax.all_gather(big_b[-1], axis),
               jax.lax.all_gather(big_c[-1], axis))  # each [D, C, H, W]
        ident = (jnp.zeros_like(big_b[-1]),
                 jnp.full_like(big_c[-1], -jnp.inf))  # max-plus identity
        excl = full = ident
        for j in range(d_axis):  # D is static (mesh size)
            step = (tot[0][j], tot[1][j])
            full = maxplus_combine(full, step)
            take = j < idx
            excl = (jnp.where(take, full[0], excl[0]),
                    jnp.where(take, full[1], excl[1]))

        # -- offset local prefixes, reconstruct local surfaces --------------
        glob_b, glob_c = maxplus_combine(excl, (big_b, big_c))
        surfaces = jnp.maximum(surface[None] + glob_b, glob_c)

        # -- final state: the full composition applied to the initial
        #    surface (deterministic and identical on every device)
        final_surface = jnp.maximum(surface + full[0], full[1])
        final_ts = jnp.maximum(prev_ts, jnp.max(dev_max)).astype(jnp.int32)

        # -- time-batched network forward on the local shard ----------------
        outs = jax.vmap(lambda fr: net.full_frame_forward(params, state, fr))(
            surfaces
        )
        new_state = (IntegrationState(final_surface, final_ts),) + tuple(state[1:])
        return new_state, outs

    def _build(self):
        if self.stream_axis is None:
            chunk_spec = EventChunk(*([P(self.axis)] * 5))
            in_specs = (P(), P(), chunk_spec)
            # REPLICATION INVARIANT: the state's out_spec is P() (replicated)
            # because _local_fn ends with every device holding the SAME
            # final_surface/final_ts — the all_gather prefix composition
            # gives each device the global totals, and the last device's
            # local scan result equals every other device's composed total.
            # check_vma=False means shard_map does NOT verify this: an edit
            # that makes the returned state device-dependent would silently
            # return one device's value.  tests/test_parallel.py gates the
            # invariant numerically against the unsharded path.
            out_specs = (P(), P(self.axis))
            local = self._local_fn
        else:
            # leaves: state [S, ...], chunks [S, T, E] — streams shard the
            # leading axis over stream_axis, time the next over axis
            chunk_spec = EventChunk(*([P(self.stream_axis, self.axis)] * 5))
            in_specs = (P(), P(self.stream_axis), chunk_spec)
            out_specs = (P(self.stream_axis), P(self.stream_axis, self.axis))

            def local(params, states, chunks):
                return jax.vmap(
                    lambda st, cs: self._local_fn(params, st, cs),
                    in_axes=(0, 0), out_axes=(0, 0),
                )(states, chunks)

        fn = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            check_vma=False,
        )
        self._jit = jax.jit(fn)

    def scan_parallel(self, params, state: tuple, chunks: EventChunk):
        """Time-sharded parallel-in-time execution.

        Single-stream engine (``stream_axis=None``): ``chunks`` leaves are
        [T, E] with T divisible by the mesh's ``time`` size.  dp x sp
        engine: state leaves carry a leading stream axis [S, ...] and
        chunks are [S, T, E], with S divisible by the ``stream_axis`` size.
        Returns ``(new_state, outs)`` matching
        ``EventNetwork.scan_parallel`` (per stream) up to float regrouping
        (~1e-6)."""
        d_axis = self.mesh.shape[self.axis]
        t_dim = 0 if self.stream_axis is None else 1
        t = chunks.y.shape[t_dim]
        if t % d_axis:
            raise ValueError(f"T={t} not divisible by time-axis size {d_axis}")
        if self.stream_axis is not None:
            s_axis = self.mesh.shape[self.stream_axis]
            if chunks.y.shape[0] % s_axis:
                raise ValueError(
                    f"S={chunks.y.shape[0]} not divisible by stream-axis "
                    f"size {s_axis}"
                )
        if self._jit is None:
            self._build()
        return self._jit(params, state, chunks)
