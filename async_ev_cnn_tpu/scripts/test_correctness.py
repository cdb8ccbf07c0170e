"""Standalone async-vs-dense equivalence check (no dataset/checkpoint).

Parity with ``python src/scripts/test_correctness.py`` in the reference
(README.md:31-32): builds the same 2-conv/2-pool network with the fixed
3x3 kernel and bias 10 on an 8x8 canvas, drives it with a random synthetic
stream for ``--iterations`` steps of 5 events, and reports the per-layer
max |async - dense| deviation.  Exits non-zero on violation of the 1e-4
parity budget.

    python -m async_ev_cnn_tpu.scripts.test_correctness --iterations 10000
"""

from __future__ import annotations

import argparse
import sys
from collections import OrderedDict

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iterations", type=int, default=10000)
    p.add_argument("--events_per_step", type=int, default=5)
    p.add_argument("--tolerance", type=float, default=1e-4)
    p.add_argument("--mode", default="dense", choices=("dense", "sparse", "sparse_pallas", "sparse_rows", "window", "full"))
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from async_ev_cnn_tpu.layers.network import EventNetwork
    from async_ev_cnn_tpu.utils.equivalence import make_stream, run_equivalence

    k = np.array([[-2, -1, 1], [-2, -1, 1], [-2, -1, 1]], np.float32).reshape(3, 3, 1, 1)
    layer_defs = OrderedDict(
        [("conv1", [3, 3, 1, 1]), ("pool1", [2, 2]), ("conv2", [3, 3, 1, 1]), ("pool2", [2, 2])]
    )
    params = {
        "w_conv1": jnp.asarray(k), "b_conv1": jnp.asarray([10.0], jnp.float32),
        "w_conv2": jnp.asarray(k), "b_conv2": jnp.asarray([10.0], jnp.float32),
    }
    net = EventNetwork(layer_defs, 8, 8, leak=0.1, alpha=0.1, padding="SAME",
                       conv_mode=args.mode)
    rng = np.random.RandomState(args.seed)
    chunks = make_stream(rng, args.iterations, args.events_per_step, 8, 8)
    report = run_equivalence(net, params, chunks)

    ok = True
    for name, diff in report.max_diff.items():
        status = "OK " if diff <= args.tolerance else "FAIL"
        print(f"{status} {name:6s} max|async-dense| = {diff:.3e} "
              f"(worst step {report.worst_step[name]})")
        ok &= diff <= args.tolerance
    if ok:
        print(f"\nSUCCESS: async == dense to {args.tolerance} over "
              f"{args.iterations} steps")
        return 0
    print("\nERROR: async/dense divergence above tolerance")
    return 1


if __name__ == "__main__":
    sys.exit(main())
