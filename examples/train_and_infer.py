"""End-to-end example: train a tiny eFCN, save a checkpoint, reload it into
the async event-driven model, and run stateful inference on an event stream.

Runs on CPU or TPU:

    python examples/train_and_infer.py

The reference framework could only *consume* externally-trained TF
checkpoints; this framework closes the loop.
"""

import numpy as np
import jax
import jax.numpy as jnp

from async_ev_cnn_tpu.layers.network import EventNetwork
from async_ev_cnn_tpu.models import YoloEventJax
from async_ev_cnn_tpu.models.train import Trainer, YoloTargets
from async_ev_cnn_tpu.utils.checkpoint import save_params
from async_ev_cnn_tpu.utils.config import layers_dict


def main():
    rng = np.random.RandomState(0)
    h = w = 16
    num_classes, num_bbox = 3, 2
    dsl = f"conv1=3,3,1,8 pool1=2,2 conv2=3,3,8,16 pool2=2,2 conv3=1,1,16,{num_classes + num_bbox * 5}"
    layers = layers_dict(dsl)

    # random init with the checkpoint naming contract
    params = {}
    for name, size in layers.items():
        if "conv" in name:
            kh, kw, ci, co = size
            params[f"w_{name}"] = jnp.asarray(rng.randn(kh, kw, ci, co).astype(np.float32) * 0.2)
            params[f"b_{name}"] = jnp.asarray(rng.randn(co).astype(np.float32) * 0.05)

    # ---- train on a toy task: a bright blob in cell (1, 1), class 1 -------
    net = EventNetwork(layers, h, w, leak=1e-4, alpha=0.1, padding="SAME")
    trainer = Trainer(net, num_classes=num_classes, num_bbox=num_bbox, grid_shape=(4, 4))
    opt_state = trainer.init(params)

    frames = np.zeros((8, h, w), np.float32)
    frames[:, 4:8, 4:8] = 1.0
    boxes = np.zeros((8, 4, 4, 4), np.float32)
    boxes[:, 1, 1] = [0.5, 0.5, 0.25, 0.25]
    obj = np.zeros((8, 4, 4), np.float32)
    obj[:, 1, 1] = 1
    cls = np.ones((8, 4, 4), np.int32)
    targets = YoloTargets(jnp.asarray(boxes), jnp.asarray(obj), jnp.asarray(cls))

    for step in range(120):
        params, opt_state, loss = trainer.step(params, opt_state, jnp.asarray(frames), targets)
        if step % 30 == 0:
            print(f"train step {step:3d}: loss {float(loss):.4f}")
    print(f"final loss: {float(loss):.4f}")

    save_params("/tmp/example_weights.npz", {k: np.asarray(v) for k, v in params.items()})

    # ---- reload into the async event model and stream events --------------
    model = YoloEventJax(
        h_frame=h, w_frame=w, num_classes=num_classes, cnn_layers=layers,
        cnn_padding="SAME", h_cells=4, w_cells=4, num_bbox=num_bbox,
        alpha=0.1, leak=1e-4, checkpoint="/tmp/example_weights.npz",
    )
    graph = model.build_graph(None)

    # events concentrated where the training blob was
    n = 400
    events = np.stack([
        rng.randint(4, 8, n), rng.randint(4, 8, n),
        np.sort(rng.randint(0, 5000, n)),
    ], axis=-1).astype(np.int32)

    out = None
    reset = True
    for i in range(0, n, 100):  # four stateful 100-event micro-batches
        out = graph(events[i : i + 100], reset)
        reset = False

    conf = out[..., num_classes:].reshape(4, 4, num_bbox, 5)[..., 4]
    cell = np.unravel_index(int(np.argmax(conf.max(-1))), (4, 4))
    print(f"async inference: best-confidence cell {cell} (trained object at (1, 1))")
    print(f"class argmax there: {int(np.argmax(out[cell[0], cell[1], :num_classes]))} (trained class 1)")


if __name__ == "__main__":
    main()
