"""Training-path tests: loss sanity and convergence on a toy task, plus the
sharded train step on the CPU mesh."""

from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp

from async_ev_cnn_tpu.layers.network import EventNetwork
from async_ev_cnn_tpu.models.train import Trainer, YoloTargets, yolo_loss
from async_ev_cnn_tpu.utils.config import layers_dict


def make_net(rng, h=16, w=16, num_classes=3, num_bbox=2):
    out_c = num_classes + num_bbox * 5
    layers = layers_dict(f"conv1=3,3,1,8 pool1=2,2 conv2=3,3,8,16 pool2=2,2 conv3=1,1,16,{out_c}")
    params = {}
    for name, size in layers.items():
        if "conv" in name:
            kh, kw, ci, co = size
            params[f"w_{name}"] = jnp.asarray(rng.randn(kh, kw, ci, co).astype(np.float32) * 0.2)
            params[f"b_{name}"] = jnp.asarray(rng.randn(co).astype(np.float32) * 0.05)
    net = EventNetwork(layers, h, w, leak=1e-4, alpha=0.1, padding="SAME")
    return net, params


def toy_batch(rng, n, sh=4, sw=4):
    frames = rng.rand(n, 16, 16).astype(np.float32)
    boxes = np.zeros((n, sh, sw, 4), np.float32)
    obj = np.zeros((n, sh, sw), np.float32)
    cls = np.zeros((n, sh, sw), np.int32)
    for i in range(n):
        # one object per frame whose cell/class depend on the frame content
        cy, cx = int(frames[i, :4, :4].sum() * 7) % sh, i % sw
        obj[i, cy, cx] = 1
        boxes[i, cy, cx] = [0.5, 0.5, 0.25, 0.25]
        cls[i, cy, cx] = i % 3
        frames[i, cy * 4 : cy * 4 + 4, cx * 4 : cx * 4 + 4] += 1.0
    return (
        jnp.asarray(frames),
        YoloTargets(jnp.asarray(boxes), jnp.asarray(obj), jnp.asarray(cls)),
    )


def test_yolo_loss_perfect_prediction_is_small(rng):
    sh = sw = 4
    num_classes, num_bbox = 3, 2
    boxes = np.zeros((sh, sw, 4), np.float32)
    obj = np.zeros((sh, sw), np.float32)
    cls = np.zeros((sh, sw), np.int32)
    obj[1, 2] = 1
    boxes[1, 2] = [0.3, 0.7, 0.16, 0.04]
    cls[1, 2] = 2
    grid = np.zeros((sh, sw, num_classes + num_bbox * 5), np.float32)
    grid[1, 2, :3] = [0, 0, 1]
    grid[1, 2, 3:8] = [0.3, 0.7, 0.4, 0.2, 1.0]  # box 0 perfect, conf 1
    loss = float(yolo_loss(jnp.asarray(grid), YoloTargets(
        jnp.asarray(boxes), jnp.asarray(obj), jnp.asarray(cls)), 3, 2))
    assert loss < 1e-6


def test_training_reduces_loss(rng):
    net, params = make_net(rng)
    trainer = Trainer(net, num_classes=3, num_bbox=2, grid_shape=(4, 4))
    opt_state = trainer.init(params)
    frames, targets = toy_batch(rng, 8)
    losses = []
    for _ in range(40):
        params, opt_state, loss = trainer.step(params, opt_state, frames, targets)
        losses.append(float(loss))
    assert losses[-1] < 0.3 * losses[0], losses[::10]


def test_sharded_train_step(rng):
    from async_ev_cnn_tpu.parallel import make_mesh

    net, params = make_net(rng)
    mesh = make_mesh(n_data=8, n_model=1)
    trainer = Trainer(net, num_classes=3, num_bbox=2, grid_shape=(4, 4), mesh=mesh)
    opt_state = trainer.init(params)
    frames, targets = toy_batch(rng, 16)
    p1, _, loss_sharded = trainer.step(params, opt_state, frames, targets)

    # must match the unsharded step
    trainer2 = Trainer(net, num_classes=3, num_bbox=2, grid_shape=(4, 4))
    p2, _, loss_plain = trainer2.step(params, trainer2.init(params), frames, targets)
    assert np.isclose(float(loss_sharded), float(loss_plain), rtol=1e-5)
    for k in params:
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p2[k]), rtol=1e-4, atol=1e-6)
