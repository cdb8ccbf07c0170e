"""CLI entry point: run a network over a dataset's test split.

Usage (parity with /root/reference/src/scripts/run_networks.py and
README.md:29-36):

    python -m async_ev_cnn_tpu.scripts.run_networks -c configs/efcn_event.yml

The network class is selected by name from the config (``YoloEventJax``,
``YoloFrameJax``, ``YoloFrameNumpy``; the reference's ``YoloEventNumpy`` /
``YoloFrameTf`` names are accepted as aliases of the event / dense-jit
variants for drop-in config compatibility).
"""

from __future__ import annotations

import json

import numpy as np

from async_ev_cnn_tpu.data import detection_reader
from async_ev_cnn_tpu.models import YoloEventJax, YoloFrameJax, YoloFrameNumpy
from async_ev_cnn_tpu.utils.config import config
from async_ev_cnn_tpu.utils.runner import EventRunner, FrameRunner, MultiStreamRunner

_NETWORKS = {
    "YoloEventJax": YoloEventJax,
    "YoloFrameJax": YoloFrameJax,
    "YoloFrameNumpy": YoloFrameNumpy,
    # reference-name aliases
    "YoloEventNumpy": YoloEventJax,
    "YoloFrameTf": YoloFrameJax,
}


def main(argv=None):
    args = config(argv)

    from async_ev_cnn_tpu.ops.conv import set_matmul_precision

    set_matmul_precision(args.matmul_precision)
    if args.yolo_cnn_layers is None:
        raise SystemExit(
            "no network layers configured: pass -c <config.yml> or "
            "--yolo_cnn_layers"
        )
    layer_modes = set(getattr(args.yolo_cnn_layers, "modes", {}).values())
    incremental = {args.mode, *layer_modes} - {"full", "auto"}
    is_event_net = "Event" in args.network
    if args.matmul_precision == "default" and incremental and is_event_net:
        import sys

        print(
            "WARNING: --matmul_precision default with incremental conv "
            f"mode(s) {sorted(incremental)}: the async-vs-dense gate drifts "
            "past 1e-4 at bf16 over 10k steps (on-chip drift experiment, "
            "docs/performance.md) — use 'high' or 'highest' with "
            "incremental modes.  'full'/'auto' hold the gate exactly at "
            "every tier.",
            file=sys.stderr,
        )

    reader = detection_reader.factory(args.input_data_dir, file_format=args.file_format)

    try:
        network_class = _NETWORKS[args.network]
    except KeyError:
        raise SystemExit(
            f"unknown network {args.network!r}; choose one of {sorted(_NETWORKS)}"
        )
    network = network_class(
        h_frame=args.frame_h, w_frame=args.frame_w,
        num_classes=reader.num_classes(), cnn_layers=args.yolo_cnn_layers,
        cnn_padding=args.yolo_cnn_padding, h_cells=args.yolo_num_cells_h,
        w_cells=args.yolo_num_cells_w, num_bbox=args.yolo_num_bbox,
        alpha=0.1, leak=args.leak, checkpoint=args.restore_net,
        conv_mode=args.mode, ts_window=args.ts_window,
        stem_fusion=args.stem_fusion, window_budget_mb=args.window_budget_mb,
        activation_dtype=args.activation_dtype,
    )
    if args.num_streams > 1:
        if not isinstance(network, YoloEventJax):
            raise SystemExit("--num_streams > 1 requires an event network")
        if args.ts_window:
            # under vmap the bounding-window cond becomes a select and both
            # formulations execute (ops/integrate.integrate_parallel) —
            # reject rather than silently ignore or pessimize
            raise SystemExit(
                "--ts_window is a per-stream dispatch knob; it does not "
                "compose with --num_streams > 1 (vmap turns its exact "
                "fallback cond into a both-branches select)"
            )
        runner = MultiStreamRunner(args, reader)
        from async_ev_cnn_tpu.utils.profiling import trace

        with trace("./jax_trace" if args.profile else None):
            stats = runner.run(network)
        print(json.dumps(stats))
        return stats

    if args.runner == "scan":
        if not isinstance(network, YoloEventJax):
            raise SystemExit("--runner scan requires an event network")
        if args.batch_size > 1:
            raise SystemExit(
                "--runner scan streams one example per fused scan; use "
                "--num_streams for multi-stream serving instead of "
                "--batch_size"
            )
        from async_ev_cnn_tpu.utils.runner import ScanEventRunner

        runner = ScanEventRunner(args, reader)
        from async_ev_cnn_tpu.utils.profiling import trace

        with trace("./jax_trace" if args.profile else None):
            stats = runner.run(network)
        if args.profile:
            print("profiler trace written to ./jax_trace")
        print(json.dumps(stats))
        return stats
    if args.runner != "step":
        raise SystemExit(f"--runner must be 'step' or 'scan', got {args.runner!r}")

    graph = network.build_graph(None)

    runner_cls = EventRunner if isinstance(network, YoloEventJax) else FrameRunner
    runner = runner_cls(args, reader)
    from async_ev_cnn_tpu.utils.profiling import trace

    with trace("./jax_trace" if args.profile else None):
        stats = runner.run(graph)
    if args.profile:
        print("profiler trace written to ./jax_trace")
    print(json.dumps(stats))
    return stats


if __name__ == "__main__":
    main()
