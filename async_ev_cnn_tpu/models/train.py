"""Training: YOLO grid loss + optax train step, shardable over a mesh.

The reference ships inference only — its checkpoints come from an external
training pipeline and are merely *restored* (event_numpy.py:34-51).  A
production framework needs to produce those checkpoints too, so this module
provides the standard YOLO-v1-style detection objective over the eFCN grid
output and a jitted/shardable train step on the dense frame model (training
runs on integrated frames; the async path is an inference-time execution
strategy of the same weights).

Sharding: data-parallel over the batch via ``jax.sharding`` constraints —
the step jits under any mesh; gradients are averaged by XLA-inserted
collectives (no hand-written psum).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from async_ev_cnn_tpu.layers.network import EventNetwork, dense_forward


class YoloTargets(NamedTuple):
    """Per-cell supervision for a ``[S_h, S_w, C + B*5]`` grid.

    Attributes:
      boxes: f32 ``[N, S_h, S_w, 4]`` (x, y in cell units; w, h normalized).
      obj:   f32 ``[N, S_h, S_w]`` 1 where a cell owns an object.
      cls:   int32 ``[N, S_h, S_w]`` class index (ignored where obj == 0).
    """

    boxes: jnp.ndarray
    obj: jnp.ndarray
    cls: jnp.ndarray


def yolo_loss(
    grid: jnp.ndarray,  # [S_h, S_w, C + B*5]
    targets: YoloTargets,  # leaves without the batch dim
    num_classes: int,
    num_bbox: int,
    lambda_coord: float = 5.0,
    lambda_noobj: float = 0.5,
) -> jnp.ndarray:
    """YOLO-v1 sum-squared grid loss for one example (sqrt-encoded w/h,
    responsible-box selection by predicted confidence)."""
    sh, sw = grid.shape[:2]
    cls_pred = grid[..., :num_classes]
    box = grid[..., num_classes:].reshape(sh, sw, num_bbox, 5)
    conf = box[..., 4]

    # responsible box = highest-confidence predictor in the cell
    resp = jax.nn.one_hot(jnp.argmax(conf, axis=-1), num_bbox)  # [S,S,B]

    tgt_xy = targets.boxes[..., :2]
    tgt_wh_sqrt = jnp.sqrt(jnp.maximum(targets.boxes[..., 2:4], 1e-8))
    pred_xy = box[..., 0:2]
    pred_wh = box[..., 2:4]  # stored sqrt-encoded (viz.py:42-43)

    obj = targets.obj[..., None]  # [S,S,1]
    coord = jnp.sum(
        resp[..., None] * obj[..., None, :]
        * (jnp.square(pred_xy - tgt_xy[..., None, :])
           + jnp.square(pred_wh - tgt_wh_sqrt[..., None, :]))
    )
    conf_obj = jnp.sum(resp * obj * jnp.square(conf - 1.0))
    conf_noobj = jnp.sum((1.0 - resp * obj) * jnp.square(conf))
    cls_tgt = jax.nn.one_hot(targets.cls, num_classes)
    cls_loss = jnp.sum(targets.obj[..., None] * jnp.square(cls_pred - cls_tgt))
    return lambda_coord * coord + conf_obj + lambda_noobj * conf_noobj + cls_loss


class Trainer:
    """Dense-frame YOLO trainer over the same layer specs as the async net."""

    def __init__(
        self,
        net: EventNetwork,
        num_classes: int,
        num_bbox: int,
        grid_shape: tuple[int, int],
        optimizer=None,
        mesh=None,
    ):
        self.net = net
        self.num_classes = num_classes
        self.num_bbox = num_bbox
        self.grid_shape = grid_shape
        self.tx = optimizer or optax.adam(1e-3)
        self.mesh = mesh
        self._jit_step = jax.jit(self._step)

    def init(self, params):
        return self.tx.init(params)

    def _forward_grid(self, params, frame):
        outs = dense_forward(self.net.event_layers, params, frame[None], "tf")
        last = next(reversed(outs.values()))
        out = self.net.apply_tail(params, jnp.transpose(last, (1, 2, 0)))
        sh, sw = self.grid_shape
        return jnp.reshape(out, (sh, sw, self.num_classes + self.num_bbox * 5))

    def _batch_loss(self, params, frames, targets):
        def one(frame, tgt):
            return yolo_loss(
                self._forward_grid(params, frame), tgt,
                self.num_classes, self.num_bbox,
            )

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            frames = jax.lax.with_sharding_constraint(
                frames, NamedSharding(self.mesh, P("data"))
            )
        return jnp.mean(jax.vmap(one)(frames, targets))

    def _step(self, params, opt_state, frames, targets):
        loss, grads = jax.value_and_grad(self._batch_loss)(params, frames, targets)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def step(self, params, opt_state, frames, targets):
        """One SGD step on a batch of integrated frames ``[N, H, W]`` and
        :class:`YoloTargets` with leading batch dim."""
        return self._jit_step(params, opt_state, frames, targets)
