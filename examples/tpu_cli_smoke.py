"""On-chip smoke of the packaged CLIs against the real TPU backend.

The CPU test suite (tests/test_cli.py) proves the CLI logic on the
8-virtual-device test backend; this script drives the same user-facing
flows — the reference's README flow (`run_networks -c cfg.yml`,
/root/reference/README.md:29-36) plus the serving deployment loop —
against the real chip through the axon tunnel, where precision pins,
dispatch chaining, and the compact wire run in their production
configuration:

  run_networks   full-mode event network over the test split
  serve          2-stream serving, detections JSONL out, --serve_state
                 save -> restore resume (stats must mark the restore)
  serve_polarity --keep_polarity with a 2-channel (ON/OFF) stem config

Each stage prints one JSON line; exits non-zero on any failed check.

STATUS / measured result (2026-08-18, v5e via tunnel): ALL PASS —
  {"stage": "run_networks", "ok": true, "steps": 6, "events_per_sec": 1306.2}
  {"stage": "serve", "ok": true, "dispatches": 1, "events": 600, "detections": 40}
  {"stage": "serve_resume", "ok": true, "state_restored": true}
  {"stage": "serve_polarity", "ok": true, "dispatches": 1, "events": 600}
  {"all_ok": true}
(events_per_sec here is tiny-geometry + per-step host fetches over the
~29 ms RTT tunnel — a smoke, not a benchmark; bench.py is the
throughput protocol.)
"""
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")
import numpy as np

import bench

bench._enable_compilation_cache()

from async_ev_cnn_tpu.data.file_reader import NReader
from async_ev_cnn_tpu.utils.checkpoint import save_params

RNG = np.random.RandomState(3)


def build_dataset(root):
    reader = NReader()
    os.makedirs(os.path.join(root, "annotations"))
    for split, k in (("train", 2), ("test", 2), ("validation", 1)):
        d = os.path.join(root, split)
        os.makedirs(d)
        for i in range(k):
            n = 300
            x = RNG.randint(0, 24, n).astype(np.int32)
            y = RNG.randint(0, 20, n).astype(np.int32)
            ts = np.sort(RNG.randint(0, 60000, n)).astype(np.int32)
            p = RNG.randint(0, 2, n).astype(np.int32)
            name = f"{split}_ex{i}"
            reader.save_example(os.path.join(d, f"{name}.bin"), x, y, ts, p)
            np.save(os.path.join(root, "annotations", f"{name}.npy"),
                    RNG.rand(1, 6).astype(np.float32))
    np.savez(os.path.join(root, "params.npz"), num_classes=3,
             label_to_idx=np.array([("a", 0), ("b", 1), ("c", 2)],
                                   dtype=object))


def build_ckpt(path, cin):
    params = {}
    for name, (kh, kw, ci, co) in (
        ("conv1", (3, 3, cin, 4)), ("conv2", (3, 3, 4, 8)),
        ("conv3", (1, 1, 8, 13)),
    ):
        params[f"w_{name}"] = RNG.randn(kh, kw, ci, co).astype(np.float32) * 0.2
        params[f"b_{name}"] = RNG.randn(co).astype(np.float32) * 0.1
    save_params(path, params)


def write_cfg(path, root, ckpt, cin):
    with open(path, "w") as fh:
        fh.write(
            f"input_data_dir: {root}\n"
            "file_format: n-data\n"
            "network: YoloEventJax\n"
            f"restore_net: {ckpt}\n"
            "leak: 1.0e-04\n"
            "batch_size: 1\n"
            "batch_event_size: 100\n"
            "frame_h: 16\nframe_w: 20\nexample_h: 20\nexample_w: 24\n"
            f"yolo_cnn_layers: conv1=3,3,{cin},4 pool1=2,2 "
            "conv2=3,3,4,8 pool2=2,2 conv3=1,1,8,13\n"
            "yolo_cnn_padding: SAME\n"
            "yolo_num_cells_h: 4\nyolo_num_cells_w: 5\nyolo_num_bbox: 2\n"
        )


def main():
    tmp = tempfile.mkdtemp(prefix="tpu_cli_smoke_")
    ok = True
    try:
        root = os.path.join(tmp, "det")
        build_dataset(root)
        ckpt1 = os.path.join(tmp, "w1.npz")
        build_ckpt(ckpt1, 1)
        cfg1 = os.path.join(tmp, "cfg1.yml")
        write_cfg(cfg1, root, ckpt1, 1)
        ckpt2 = os.path.join(tmp, "w2.npz")
        build_ckpt(ckpt2, 2)
        cfg2 = os.path.join(tmp, "cfg2.yml")
        write_cfg(cfg2, root, ckpt2, 2)

        from async_ev_cnn_tpu.scripts.run_networks import main as run_main
        from async_ev_cnn_tpu.scripts.serve import main as serve_main

        stats = run_main(["-c", cfg1, "--mode", "full"])
        row_ok = stats["steps"] >= 2 and stats["events_per_sec"] > 0
        ok &= row_ok
        print(json.dumps({"stage": "run_networks", "ok": bool(row_ok),
                          "steps": stats["steps"],
                          "events_per_sec": stats["events_per_sec"]}),
              flush=True)

        out = os.path.join(tmp, "dets.jsonl")
        st = os.path.join(tmp, "state.npz")
        stats = serve_main(["-c", cfg1, "--mode", "full",
                            "--serve_chunks", "3", "--num_streams", "2",
                            "--conf_threshold", "0.0", "--out", out,
                            "--serve_state", st])
        n_lines = sum(1 for _ in open(out))
        # data_transform center-crops 20x24 -> 16x20, dropping events
        # outside the window, so served events < the 600 raw ones
        row_ok = (stats["dispatches"] >= 1 and 0 < stats["events"] <= 600
                  and not stats["state_restored"]
                  and n_lines == stats["detections_written"] > 0)
        ok &= row_ok
        print(json.dumps({"stage": "serve", "ok": bool(row_ok),
                          "dispatches": stats["dispatches"],
                          "events": stats["events"],
                          "detections": stats["detections_written"]}),
              flush=True)

        stats = serve_main(["-c", cfg1, "--mode", "full",
                            "--serve_chunks", "3", "--num_streams", "2",
                            "--serve_state", st])
        row_ok = bool(stats["state_restored"])
        ok &= row_ok
        print(json.dumps({"stage": "serve_resume", "ok": row_ok,
                          "state_restored": stats["state_restored"]}),
              flush=True)

        stats = serve_main(["-c", cfg2, "--mode", "full",
                            "--serve_chunks", "3", "--num_streams", "2",
                            "--keep_polarity", "true"])
        row_ok = stats["dispatches"] >= 1 and 0 < stats["events"] <= 600
        ok &= row_ok
        print(json.dumps({"stage": "serve_polarity", "ok": bool(row_ok),
                          "dispatches": stats["dispatches"],
                          "events": stats["events"]}), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"all_ok": bool(ok)}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
