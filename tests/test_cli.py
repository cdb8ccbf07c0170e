"""End-to-end CLI test: synthetic detection dataset -> YAML config ->
run_networks over the test split (the reference's README flow,
README.md:29-36)."""

import numpy as np
import pytest

from async_ev_cnn_tpu.data.file_reader import NReader
from async_ev_cnn_tpu.utils.checkpoint import save_params


@pytest.fixture
def tiny_detection_root(tmp_path, rng):
    reader = NReader()
    root = tmp_path / "det"
    (root / "annotations").mkdir(parents=True)
    for split, k in (("train", 2), ("test", 2), ("validation", 1)):
        d = root / split
        d.mkdir()
        for i in range(k):
            n = 300
            x = rng.randint(0, 24, n).astype(np.int32)
            y = rng.randint(0, 20, n).astype(np.int32)
            ts = np.sort(rng.randint(0, 60000, n)).astype(np.int32)
            p = rng.randint(0, 2, n).astype(np.int32)
            name = f"{split}_ex{i}"
            reader.save_example(str(d / f"{name}.bin"), x, y, ts, p)
            np.save(str(root / "annotations" / f"{name}.npy"),
                    rng.rand(1, 6).astype(np.float32))
    np.savez(str(root / "params.npz"), num_classes=3,
             label_to_idx=np.array([("a", 0), ("b", 1), ("c", 2)], dtype=object))
    return root


def _write_cfg(tmp_path, root, network, ckpt):
    cfg = tmp_path / "cfg.yml"
    cfg.write_text(
        f"input_data_dir: {root}\n"
        "file_format: n-data\n"
        f"network: {network}\n"
        f"restore_net: {ckpt}\n"
        "leak: 1.0e-04\n"
        "batch_size: 1\n"
        "batch_event_size: 100\n"
        "frame_h: 16\nframe_w: 20\nexample_h: 20\nexample_w: 24\n"
        "yolo_cnn_layers: conv1=3,3,1,4 pool1=2,2 conv2=3,3,4,8 pool2=2,2 conv3=1,1,8,13\n"
        "yolo_cnn_padding: SAME\n"
        "yolo_num_cells_h: 4\nyolo_num_cells_w: 5\nyolo_num_bbox: 2\n"
    )
    return cfg


@pytest.fixture
def tiny_ckpt(tmp_path, rng):
    params = {}
    for name, (kh, kw, ci, co) in (
        ("conv1", (3, 3, 1, 4)), ("conv2", (3, 3, 4, 8)), ("conv3", (1, 1, 8, 13))
    ):
        params[f"w_{name}"] = rng.randn(kh, kw, ci, co).astype(np.float32) * 0.2
        params[f"b_{name}"] = rng.randn(co).astype(np.float32) * 0.1
    path = str(tmp_path / "weights.npz")
    save_params(path, params)
    return path


@pytest.mark.parametrize("network", ["YoloEventJax", "YoloFrameJax", "YoloEventNumpy"])
def test_run_networks_cli(tmp_path, tiny_detection_root, tiny_ckpt, network):
    from async_ev_cnn_tpu.scripts.run_networks import main

    cfg = _write_cfg(tmp_path, tiny_detection_root, network, tiny_ckpt)
    stats = main(["-c", str(cfg)])
    assert stats["steps"] >= 2
    assert stats["events_per_sec"] > 0


def test_run_networks_usec_batching(tmp_path, tiny_detection_root, tiny_ckpt):
    from async_ev_cnn_tpu.scripts.run_networks import main

    cfg = _write_cfg(tmp_path, tiny_detection_root, "YoloEventJax", tiny_ckpt)
    stats = main(["-c", str(cfg), "--batch_event_usec", "5000"])
    assert stats["steps"] >= 2


def test_run_networks_multi_stream(tmp_path, tiny_detection_root, tiny_ckpt):
    from async_ev_cnn_tpu.scripts.run_networks import main

    cfg = _write_cfg(tmp_path, tiny_detection_root, "YoloEventJax", tiny_ckpt)
    stats = main(["-c", str(cfg), "--num_streams", "2"])
    assert stats["examples"] >= 2 and stats["events_per_sec"] > 0


def test_run_networks_multi_stream_full_mode(tmp_path, tiny_detection_root, tiny_ckpt):
    # full-mode serving routes through the mesh parallel-in-time path
    from async_ev_cnn_tpu.scripts.run_networks import main

    cfg = _write_cfg(tmp_path, tiny_detection_root, "YoloEventJax", tiny_ckpt)
    stats = main(["-c", str(cfg), "--num_streams", "2", "--mode", "full"])
    assert stats["examples"] >= 2 and stats["events_per_sec"] > 0


def test_run_networks_scan_runner(tmp_path, tiny_detection_root, tiny_ckpt):
    from async_ev_cnn_tpu.scripts.run_networks import main

    cfg = _write_cfg(tmp_path, tiny_detection_root, "YoloEventJax", tiny_ckpt)
    stats = main(["-c", str(cfg), "--runner", "scan"])
    assert stats["examples"] == 2 and stats["events_per_sec"] > 0
    with pytest.raises(SystemExit):
        main(["-c", str(cfg), "--runner", "warp"])


def test_run_networks_mixed_modes(tmp_path, tiny_detection_root, tiny_ckpt):
    """Per-layer @mode DSL through the CLI (window early, full late — the
    configs/efcn_event_mixed.yml pattern at test scale)."""
    from async_ev_cnn_tpu.scripts.run_networks import main

    cfg = _write_cfg(tmp_path, tiny_detection_root, "YoloEventJax", tiny_ckpt)
    text = cfg.read_text()
    text = text.replace("conv1=3,3,1,4", "conv1=3,3,1,4@window")
    text = text.replace("conv2=3,3,4,8", "conv2=3,3,4,8@full")
    cfg.write_text(text)
    stats = main(["-c", str(cfg)])
    assert stats["steps"] >= 2 and stats["events_per_sec"] > 0


def test_run_networks_scan_runner_usec(tmp_path, tiny_detection_root, tiny_ckpt):
    """µs-binned micro-batching in the fused-scan path (reference
    runner.py:65-72 semantics with padded variable-occupancy bins)."""
    from async_ev_cnn_tpu.scripts.run_networks import main

    cfg = _write_cfg(tmp_path, tiny_detection_root, "YoloEventJax", tiny_ckpt)
    stats = main(
        ["-c", str(cfg), "--runner", "scan", "--batch_event_usec", "5000"]
    )
    assert stats["examples"] == 2 and stats["events_per_sec"] > 0


def test_pack_chunks_usec_partition():
    """Every event lands in exactly one chunk; chunk spans respect the µs
    bin width; oversized bins split by count instead of dropping."""
    from async_ev_cnn_tpu.utils.runner import pack_chunks_usec

    rng = np.random.RandomState(7)
    n = 500
    ts = np.cumsum(rng.randint(1, 40, size=n)).astype(np.int32)
    ev = np.stack([
        rng.randint(0, 16, n).astype(np.int32),
        rng.randint(0, 16, n).astype(np.int32),
        ts,
    ], axis=-1)
    cap, usec = 32, 800
    chunks = pack_chunks_usec(ev, cap, usec)
    valid = np.asarray(chunks.valid)
    assert valid.sum() == n  # no drops, no duplicates
    y, x, t = (np.asarray(a) for a in (chunks.y, chunks.x, chunks.ts))
    got = np.stack([y[valid], x[valid], t[valid]], axis=-1)
    np.testing.assert_array_equal(got, ev)  # order preserved
    for i in range(valid.shape[0]):
        row_ts = t[i][valid[i]]
        if row_ts.size:
            assert row_ts.max() - row_ts.min() < usec
        assert valid[i].sum() <= cap

    # force an overflowing bin: all events in one window
    ev2 = ev.copy()
    ev2[:, 2] = np.arange(n, dtype=np.int32)  # 500 events in <800 µs
    chunks2 = pack_chunks_usec(ev2, cap, usec)
    v2 = np.asarray(chunks2.valid)
    assert v2.sum() == n and v2.shape[0] >= int(np.ceil(n / cap))


def test_run_networks_polarity_channels(tmp_path, tiny_detection_root, rng):
    from async_ev_cnn_tpu.scripts.run_networks import main
    from async_ev_cnn_tpu.utils.checkpoint import save_params

    params = {}
    for name, (kh, kw, ci, co) in (
        ("conv1", (3, 3, 2, 4)), ("conv2", (3, 3, 4, 8)), ("conv3", (1, 1, 8, 13))
    ):
        params[f"w_{name}"] = rng.randn(kh, kw, ci, co).astype(np.float32) * 0.2
        params[f"b_{name}"] = rng.randn(co).astype(np.float32) * 0.1
    ckpt = str(tmp_path / "w2.npz")
    save_params(ckpt, params)
    cfg = _write_cfg(tmp_path, tiny_detection_root, "YoloEventJax", ckpt)
    stats = main([
        "-c", str(cfg), "--keep_polarity", "true",
        "--yolo_cnn_layers",
        "conv1=3,3,2,4 pool1=2,2 conv2=3,3,4,8 pool2=2,2 conv3=1,1,8,13",
    ])
    assert stats["steps"] >= 2


@pytest.mark.parametrize("network", ["YoloEventJax", "YoloFrameJax"])
def test_evaluate_cli(tmp_path, tiny_detection_root, tiny_ckpt, network):
    from async_ev_cnn_tpu.scripts.evaluate import main

    cfg = _write_cfg(tmp_path, tiny_detection_root, network, tiny_ckpt)
    result = main(["-c", str(cfg)])
    assert 0.0 <= result["mAP"] <= 1.0
    assert len(result["ap_per_class"]) == 3


def test_correctness_script():
    from async_ev_cnn_tpu.scripts.test_correctness import main

    assert main(["--iterations", "200"]) == 0
    assert main(["--iterations", "100", "--mode", "sparse", "--tolerance", "2e-4"]) == 0


def test_run_networks_ts_window(tmp_path, tiny_detection_root, tiny_ckpt):
    """--ts_window routes the full-mode scan runner's parallel-in-time path
    through the bounding-window ts-map (exact; overflow falls back)."""
    from async_ev_cnn_tpu.scripts.run_networks import main

    cfg = _write_cfg(tmp_path, tiny_detection_root, "YoloEventJax", tiny_ckpt)
    base = main(["-c", str(cfg), "--runner", "scan", "--mode", "full"])
    win = main(["-c", str(cfg), "--runner", "scan", "--mode", "full",
                "--ts_window", "8"])
    assert win["examples"] == base["examples"]
    assert win["events_per_sec"] > 0


def test_repo_configs_parse(tmp_path, tiny_detection_root, tiny_ckpt):
    """Every checked-in config must at least parse through the CLI config
    loader (data paths are swapped for the tiny fixture)."""
    import glob

    from async_ev_cnn_tpu.utils.config import config

    for cfg in sorted(glob.glob("configs/*.yml")):
        args = config(["-c", cfg, "--input_data_dir", str(tiny_detection_root)])
        assert args.yolo_cnn_layers and args.frame_h > 0, cfg


def test_run_networks_stem_fusion_flag(tmp_path, tiny_detection_root, tiny_ckpt):
    """--stem_fusion composes with full-mode execution (opt-in s2d pairs)."""
    from async_ev_cnn_tpu.scripts.run_networks import main

    cfg = _write_cfg(tmp_path, tiny_detection_root, "YoloEventJax", tiny_ckpt)
    stats = main(["-c", str(cfg), "--mode", "full", "--stem_fusion", "true"])
    assert stats["steps"] >= 2 and stats["events_per_sec"] > 0


def test_serve_cli(tmp_path, tiny_detection_root, tiny_ckpt):
    """The serve CLI runs the StreamingPipeline engine over the test
    split as continuous streams and writes NMS'd detections."""
    from async_ev_cnn_tpu.scripts.serve import main

    cfg = _write_cfg(tmp_path, tiny_detection_root, "YoloEventJax", tiny_ckpt)
    out = tmp_path / "dets.jsonl"
    stats = main(["-c", str(cfg), "--mode", "full", "--serve_chunks", "2",
                  "--out", str(out), "--conf_threshold", "-10.0"])
    assert stats["dispatches"] >= 1
    assert stats["events"] > 0
    assert stats["events_per_sec"] > 0
    # conf_threshold -10 keeps every NMS survivor: file must be non-empty
    import json as json_mod

    lines = [json_mod.loads(l) for l in out.read_text().splitlines()]
    assert stats["detections_written"] == len(lines) > 0
    assert {"dispatch", "stream", "chunk", "bbox_xywh", "score",
            "class"} <= set(lines[0])


def test_serve_cli_multistream_no_out(tmp_path, tiny_detection_root,
                                      tiny_ckpt):
    from async_ev_cnn_tpu.scripts.serve import main

    cfg = _write_cfg(tmp_path, tiny_detection_root, "YoloEventJax", tiny_ckpt)
    stats = main(["-c", str(cfg), "--mode", "full", "--serve_chunks", "2",
                  "--num_streams", "2", "--serve_max_dispatches", "1"])
    assert stats["dispatches"] == 1
    assert stats["streams"] == 2
    assert stats["detections_written"] is None


def test_serve_cli_rejects_incremental_mode(tmp_path, tiny_detection_root,
                                            tiny_ckpt):
    from async_ev_cnn_tpu.scripts.serve import main

    cfg = _write_cfg(tmp_path, tiny_detection_root, "YoloEventJax", tiny_ckpt)
    with pytest.raises(SystemExit, match="full"):
        main(["-c", str(cfg), "--mode", "dense"])


def test_serve_cli_state_resume(tmp_path, tiny_detection_root, tiny_ckpt):
    """--serve_state round-trips the mid-stream network state: first run
    writes it, second run restores it (crash/maintenance resume), and a
    pipeline with a different stream count refuses the checkpoint."""
    from async_ev_cnn_tpu.scripts.serve import main

    cfg = _write_cfg(tmp_path, tiny_detection_root, "YoloEventJax", tiny_ckpt)
    st = tmp_path / "serve_state.npz"
    out = tmp_path / "dets.jsonl"
    base = ["-c", str(cfg), "--mode", "full", "--serve_chunks", "2",
            "--serve_max_dispatches", "1", "--serve_state", str(st),
            "--out", str(out), "--conf_threshold", "-10.0"]
    stats = main(base)
    assert stats["state_restored"] is False
    assert st.exists()
    lines_first = len(out.read_text().splitlines())
    assert lines_first > 0
    stats = main(base)
    assert stats["state_restored"] is True
    # a resumed run APPENDS to --out; truncating would destroy the
    # pre-crash detections the checkpoint exists to continue from
    assert len(out.read_text().splitlines()) > lines_first
    with pytest.raises(ValueError, match="leaves|shape"):
        main(base + ["--num_streams", "2"])


def test_serve_cli_bf16_activations(tmp_path, tiny_detection_root,
                                    tiny_ckpt):
    """The bf16 activation-storage serving knob composes with the serve
    CLI's StreamingPipeline path end-to-end."""
    from async_ev_cnn_tpu.scripts.serve import main

    cfg = _write_cfg(tmp_path, tiny_detection_root, "YoloEventJax", tiny_ckpt)
    stats = main(["-c", str(cfg), "--mode", "full", "--serve_chunks", "2",
                  "--activation_dtype", "bfloat16",
                  "--serve_max_dispatches", "1"])
    assert stats["dispatches"] == 1
    assert stats["events"] > 0


def test_split_micro_batches_usec_uses_ts_column():
    """With keep_polarity the events are [N, 4]; the µs binner must read
    column 2 (ts), not the last column (polarity — which collapsed the
    whole stream into one bin)."""
    from async_ev_cnn_tpu.utils.runner import split_micro_batches

    n = 10
    ev4 = np.stack([np.zeros(n), np.zeros(n),
                    np.arange(n) * 100, np.arange(n) % 2], -1).astype(np.int32)
    pieces4 = split_micro_batches(ev4, batch_event_usec=200)
    pieces3 = split_micro_batches(ev4[:, :3], batch_event_usec=200)
    assert [len(p) for p in pieces4] == [len(p) for p in pieces3]
    assert len(pieces4) > 1
    # and empty streams yield zero micro-batches, not a crash
    assert split_micro_batches(np.zeros((0, 3), np.int32), 8) == []


def test_pack_chunks_carry_polarity():
    """[N, 4] streams keep their polarity column (hardcoded p=0 routed
    every ON event of a 2-channel network into channel 0)."""
    from async_ev_cnn_tpu.utils.runner import pack_chunks, pack_chunks_usec

    n = 10
    ev = np.stack([np.zeros(n), np.arange(n),
                   np.arange(n) * 10 + 1, np.arange(n) % 2], -1).astype(np.int32)
    for chunks in (pack_chunks(ev, 4), pack_chunks_usec(ev, 4, 1000)):
        p = np.asarray(chunks.p)[np.asarray(chunks.valid)]
        np.testing.assert_array_equal(np.sort(p), np.sort(ev[:, 3]))


def test_pack_chunks_validates_timestamps():
    from async_ev_cnn_tpu.utils.runner import pack_chunks

    ev = np.array([[1, 2, -5]], np.int32)
    with pytest.raises(ValueError, match="negative"):
        pack_chunks(ev, 4)


def test_serve_cli_keep_polarity(tmp_path, tiny_detection_root, rng):
    """serve --keep_polarity: the 2-channel (ON/OFF) surface network runs
    end-to-end through the wire (round-4 verdict: the polarity superset
    must compose with the flagship serving engine)."""
    from async_ev_cnn_tpu.scripts.serve import main

    params = {}
    for name, (kh, kw, ci, co) in (
        ("conv1", (3, 3, 2, 4)), ("conv2", (3, 3, 4, 8)),
        ("conv3", (1, 1, 8, 13)),
    ):
        params[f"w_{name}"] = rng.randn(kh, kw, ci, co).astype(np.float32) * 0.2
        params[f"b_{name}"] = rng.randn(co).astype(np.float32) * 0.1
    ckpt = str(tmp_path / "w2.npz")
    save_params(ckpt, params)
    cfg = _write_cfg(tmp_path, tiny_detection_root, "YoloEventJax", ckpt)
    out = tmp_path / "dets.jsonl"
    stats = main([
        "-c", str(cfg), "--mode", "full", "--serve_chunks", "2",
        "--keep_polarity", "true", "--out", str(out),
        "--conf_threshold", "-10.0",
        "--yolo_cnn_layers",
        "conv1=3,3,2,4 pool1=2,2 conv2=3,3,4,8 pool2=2,2 conv3=1,1,8,13",
    ])
    assert stats["dispatches"] >= 1 and stats["events"] > 0
    assert stats["detections_written"] > 0


def test_serve_cli_keep_polarity_needs_two_channels(
        tmp_path, tiny_detection_root, tiny_ckpt):
    from async_ev_cnn_tpu.scripts.serve import main

    cfg = _write_cfg(tmp_path, tiny_detection_root, "YoloEventJax", tiny_ckpt)
    with pytest.raises(SystemExit, match="in_channels must be 2"):
        main(["-c", str(cfg), "--mode", "full", "--keep_polarity", "true"])


def test_serve_cli_latency_stats_and_no_phantom_chunks(
        tmp_path, tiny_detection_root, tiny_ckpt):
    """The stats line carries per-dispatch latency quantiles, and padded
    no-op tail chunks write NO detection rows (they repeat the previous
    surface — the advisor's phantom-duplicate finding)."""
    import json as json_mod

    from async_ev_cnn_tpu.scripts.serve import main

    cfg = _write_cfg(tmp_path, tiny_detection_root, "YoloEventJax", tiny_ckpt)
    out = tmp_path / "dets.jsonl"
    # 2 test examples x 300 events, capacity 100 -> 6 real chunks on the
    # single stream; serve_chunks=8 pads the dispatch with 2 no-op chunks
    stats = main(["-c", str(cfg), "--mode", "full", "--serve_chunks", "8",
                  "--out", str(out), "--conf_threshold", "-10.0"])
    lat = stats["latency"]
    assert lat["n"] == stats["dispatches"] >= 1
    assert lat["dispatch_latency_ms"]["p50"] > 0
    assert lat["event_age_ms"]["p99"] >= lat["event_age_ms"]["p50"]
    lines = [json_mod.loads(l) for l in out.read_text().splitlines()]
    assert lines, "conf_threshold -10 must keep every NMS survivor"
    assert max(l["chunk"] for l in lines) <= 5, (
        "padding chunks must not write phantom detections")
