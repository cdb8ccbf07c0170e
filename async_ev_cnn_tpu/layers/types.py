"""Core pytree types shared by the event-layer runtime.

Shapes are static everywhere: an event micro-batch is a fixed-capacity padded
chunk, and inter-layer "events" are dense boolean active-site masks rather
than the reference's variable-length coordinate lists
(cf. /root/reference/src/layers/layer.py:38-44).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def validate_int32_ts(ts) -> np.ndarray:
    """Enforce the NON-NEGATIVE int32 µs timestamp contract and return the
    int32 array.  A negative or wrapped ts makes ``dt = last_ts - ts``
    exceed 2^31, which the event-scatter kernel's 31-bit limb payload
    cannot carry — it would silently diverge from the other engines.
    Shared by :meth:`EventChunk.from_arrays` and the runner pack helpers
    (which used to bypass these checks with a bare int32 cast)."""
    ts_in = np.asarray(ts)
    if ts_in.size:
        lo = int(ts_in.min())
        hi = int(ts_in.max()) if ts_in.dtype != np.int32 else 0
        info = np.iinfo(np.int32)
        if lo < info.min or hi > info.max:
            raise ValueError(
                f"timestamps [{lo}, {hi}] exceed the int32 µs contract "
                "(~35.8 min); rebase the recording (subtract the first "
                "timestamp) before chunking"
            )
        if lo < 0:
            raise ValueError(
                f"negative timestamp {lo}: rebase the recording "
                "(subtract the first timestamp) before chunking"
            )
    return ts_in.astype(np.int32)


class EventChunk(NamedTuple):
    """A fixed-capacity micro-batch of DVS events.

    Mirrors the reference's ``events`` array of ``[y, x, ts]`` rows
    (/root/reference/src/libs/runner.py:32) but padded to a static capacity
    ``E`` with a validity mask so it can be traced once and scanned over.

    Attributes:
      y, x: int32 ``[E]`` pixel coordinates.
      ts:   int32 ``[E]`` timestamps (microseconds), non-decreasing over the
            stream.  int32 µs wraps after ~35 min; rebase long recordings
            (the runners' data_transform subtracts the first timestamp,
            matching the reference runner.py:26).
      p:    int32 ``[E]`` polarity. Carried for API parity; the eFCN pipeline
            drops polarity before the network exactly like the reference
            (/root/reference/src/libs/runner.py:32).
      valid: bool ``[E]`` — True for real events, False for padding.
    """

    y: jnp.ndarray
    x: jnp.ndarray
    ts: jnp.ndarray
    p: jnp.ndarray
    valid: jnp.ndarray

    @property
    def capacity(self) -> int:
        return int(self.y.shape[-1])

    @staticmethod
    def from_arrays(y, x, ts, p=None, capacity: int | None = None) -> "EventChunk":
        """Builds a padded chunk from variable-length host arrays.

        Raises on timestamps outside the int32 µs contract instead of
        wrapping silently (EVT2/EVT3 decode to int64-capable wire times; a
        >~35.8 min recording must be rebased upstream — the runners'
        ``data_transform`` subtracts the first timestamp)."""
        y = np.asarray(y, np.int32)
        x = np.asarray(x, np.int32)
        ts = validate_int32_ts(ts)
        p = np.zeros_like(y) if p is None else np.asarray(p, np.int32)
        n = y.shape[0]
        cap = n if capacity is None else capacity
        if n > cap:
            raise ValueError(f"chunk of {n} events exceeds capacity {cap}")
        pad = cap - n
        valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])

        def _pad(a):
            return np.concatenate([a, np.zeros(pad, a.dtype)])

        return EventChunk(
            y=jnp.asarray(_pad(y)),
            x=jnp.asarray(_pad(x)),
            ts=jnp.asarray(_pad(ts)),
            p=jnp.asarray(_pad(p)),
            valid=jnp.asarray(valid),
        )


class LayerIO(NamedTuple):
    """What one event layer exposes to the next after its update.

    This is the functional equivalent of the reference's accessor quartet
    ``surface() / layer_actfn() / conv_actfn() / out events``
    (/root/reference/src/layers/layer.py:53-81), materialised once per step:

    Attributes:
      surface:    f32 ``[C, H, W]`` pre-activation feature map.
      layer_actfn: f32 ``[C, H, W]`` multiplicative activation mask of this
            layer (leaky-ReLU-as-mask: 1 where surface > 0 else alpha).
      conv_actfn: f32 ``[C, H, W]`` cumulative linearisation of the network
            up to and including this layer (the reference's
            ``conv_actfn()`` *product*, conv2d.py:90-94), used by the next
            conv layer to propagate the leak.
      mask:       bool ``[H, W]`` active sites ("events") produced by this
            layer's update.
    """

    surface: jnp.ndarray
    layer_actfn: jnp.ndarray
    conv_actfn: jnp.ndarray
    mask: jnp.ndarray

    @property
    def featuremap(self) -> jnp.ndarray:
        """``surface * layer_actfn`` (/root/reference/src/layers/layer.py:77-81)."""
        return self.surface * self.layer_actfn


class IntegrationState(NamedTuple):
    """State of the leaky-surface input layer (integration.py:23-27)."""

    surface: jnp.ndarray  # f32 [1, H, W]
    prev_ts: jnp.ndarray  # int32 scalar


class ConvState(NamedTuple):
    """State of an incremental conv layer (conv2d.py:59-63)."""

    featuremap: jnp.ndarray  # f32 [O, oh, ow] pre-activation surface
    conv_actfn: jnp.ndarray  # f32 [O, oh, ow] raw cumulative linearisation


class PoolState(NamedTuple):
    """State of an incremental max-pool layer (maxpool.py:33-36)."""

    idx_max: jnp.ndarray     # int32 [C, oh, ow] within-window flat argmax
    recompute: jnp.ndarray   # bool [oh, ow] windows whose max is unstable
