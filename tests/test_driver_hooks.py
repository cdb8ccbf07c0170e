"""The driver-facing surfaces must never break: bench.py's measurement
functions and __graft_entry__'s entry/dryrun, exercised at toy scale."""

import json
import sys

import numpy as np
import pytest


@pytest.fixture
def bench_mod(monkeypatch):
    sys.path.insert(0, "/root/repo")
    import bench

    # shrink the workload: 16x16 frame (one pool level), 4 chunks of 20
    monkeypatch.setattr(bench, "H", 16)
    monkeypatch.setattr(bench, "W", 16)
    monkeypatch.setattr(bench, "T_CHUNKS", 4)
    monkeypatch.setattr(bench, "CHUNK_EVENTS", 20)
    monkeypatch.setattr(bench, "CAPACITY", 32)
    monkeypatch.setattr(
        bench, "EFCN_DSL",
        "conv1=3,3,1,4 pool1=2,2 conv2=3,3,4,8 pool2=2,2 conv3=1,1,8,12",
    )
    return bench


def test_bench_functions_smoke(bench_mod):
    from async_ev_cnn_tpu.utils.config import layers_dict

    layer_defs = layers_dict(bench_mod.EFCN_DSL)
    rng = np.random.RandomState(0)
    params = bench_mod.make_params(layer_defs, rng)
    events = bench_mod.synth_stream(rng, bench_mod.T_CHUNKS, bench_mod.CHUNK_EVENTS)

    eps, dt, spread = bench_mod.bench_tpu_async(params, layer_defs, events)
    assert eps > 0 and dt > 0 and spread >= 0
    par_eps, _, _ = bench_mod.bench_tpu_parallel(params, layer_defs, events)
    assert par_eps > 0
    par16_eps, _, _ = bench_mod.bench_tpu_parallel(
        params, layer_defs, events, activation_dtype="bfloat16")
    assert par16_eps > 0
    dense_eps, _, _ = bench_mod.bench_tpu_dense_frame(params, layer_defs, events)
    assert dense_eps > 0
    serving = bench_mod.bench_tpu_serving_saturation(
        params, layer_defs, events, streams=(2,)
    )
    assert serving["peak_streams"] == 2
    assert serving["peak_events_per_sec"] > 0
    assert serving["sweep"][0]["latency_ms_per_dispatch"] > 0
    serving16 = bench_mod.bench_tpu_serving_saturation(
        params, layer_defs, events, streams=(2,),
        activation_dtype="bfloat16",
    )
    assert serving16["peak_events_per_sec"] > 0
    cpu_eps, _ = bench_mod.bench_cpu_dense_proxy(
        params, layer_defs, events, steps=2
    )
    assert cpu_eps > 0
    async_eps = bench_mod.bench_cpu_async_baseline(
        params, layer_defs, events, max_chunks=3
    )
    assert async_eps > 0


@pytest.mark.parametrize("streams", [1, 2])
@pytest.mark.parametrize("wire", ["ultra4", "ultra", "compact", "plain"])
def test_bench_sustained_pipeline_smoke(bench_mod, monkeypatch, streams, wire):
    """The sustained file->device pipeline must run end-to-end at toy
    scale on CPU, for every wire tier (the synthetic clustered stream's
    1-14 µs gaps fit even the 2.5 B ultra4 gate) and both the
    single-stream and the vmapped multi-stream (serving-shape)
    dispatch."""
    from async_ev_cnn_tpu.utils.config import layers_dict

    monkeypatch.setattr(bench_mod, "T_PARALLEL", 4)
    layer_defs = layers_dict(bench_mod.EFCN_DSL)
    rng = np.random.RandomState(0)
    params = bench_mod.make_params(layer_defs, rng)
    eps, host_eps, mbps, n, lat = bench_mod.bench_sustained_pipeline(
        params, layer_defs, seconds=1, files=3, chunks_per_dispatch=4,
        force_wire=wire, max_in_flight=4, streams=streams,
    )
    assert eps > 0 and host_eps > 0 and mbps > 0 and n >= 1
    assert lat["n"] >= 1
    assert lat["dispatch_latency_ms"]["p50"] > 0
    assert lat["event_age_ms"]["p99"] >= lat["event_age_ms"]["p50"]


def test_bench_sustained_pipeline_bf16_act(bench_mod, monkeypatch):
    """The bf16 activation-storage pipe leg (the knob's honest
    end-to-end row) runs at toy scale on CPU."""
    from async_ev_cnn_tpu.utils.config import layers_dict

    monkeypatch.setattr(bench_mod, "T_PARALLEL", 4)
    layer_defs = layers_dict(bench_mod.EFCN_DSL)
    rng = np.random.RandomState(0)
    params = bench_mod.make_params(layer_defs, rng)
    eps, host_eps, mbps, n, lat = bench_mod.bench_sustained_pipeline(
        params, layer_defs, seconds=1, files=3, chunks_per_dispatch=4,
        max_in_flight=4, activation_dtype="bfloat16",
    )
    assert eps > 0 and host_eps > 0 and mbps > 0 and n >= 1
    assert lat["n"] >= 1


def test_graft_entry_single_chip():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    state, grid = jax.jit(fn)(*args)
    assert grid.shape == (5, 7, 110)
    assert bool(jax.numpy.all(jax.numpy.isfinite(grid)))


@pytest.mark.slow
def test_graft_entry_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_multichip_driver_env():
    """Simulate the driver: fresh subprocess, no conftest CPU forcing, the
    environment's own JAX_PLATFORMS (e.g. a pinned hardware platform).
    ``dryrun_multichip`` must force the 8-virtual-CPU mesh itself."""
    import os
    import subprocess

    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN_OK')",
        ],
        cwd="/root/repo",
        env=dict(os.environ),  # driver env verbatim — no JAX_PLATFORMS override
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRYRUN_OK" in proc.stdout


def test_profile_layers_toy(bench_mod):
    """profile_layers returns one marginal row per layer plus TOTAL, and
    the marginals sum to the total."""
    import jax.numpy as jnp

    from async_ev_cnn_tpu.layers.network import EventNetwork
    from async_ev_cnn_tpu.utils.config import layers_dict
    from async_ev_cnn_tpu.utils.profiling import profile_layers
    from async_ev_cnn_tpu.utils.runner import pack_chunks

    layer_defs = layers_dict(bench_mod.EFCN_DSL)
    rng = np.random.RandomState(0)
    params = {k: jnp.asarray(v)
              for k, v in bench_mod.make_params(layer_defs, rng).items()}
    events = bench_mod.synth_stream(rng, 4, 10)
    chunks = pack_chunks(events, 16)
    net = EventNetwork(layer_defs, bench_mod.H, bench_mod.W, leak=1e-4,
                       alpha=0.1, padding="SAME")
    rows = profile_layers(net, params, chunks, reps=1, dispatches=1)
    assert rows[-1][0] == "TOTAL" and rows[-1][1] > 0
    assert len(rows) == len(net.event_layers) + 1
    assert [name for name, _ in rows[:-1]] == [
        ld.name for ld in net.event_layers
    ]
    assert all(np.isfinite(ms) for _, ms in rows)


def test_profile_layers_parallel_toy(rng):
    """profile_layers_parallel: one 'integrate' row + one per conv/pool
    layer + TOTAL; marginals sum to the total; non-'full' nets rejected."""
    from collections import OrderedDict

    import jax.numpy as jnp
    import pytest

    from async_ev_cnn_tpu.layers.network import EventNetwork
    from async_ev_cnn_tpu.utils.profiling import profile_layers_parallel
    from async_ev_cnn_tpu.utils.runner import pack_chunks

    layer_defs = OrderedDict(conv1=[3, 3, 1, 4], pool1=[2, 2], conv2=[1, 1, 4, 6])
    params = {}
    for name, size in layer_defs.items():
        if "conv" in name:
            kh, kw, ci, co = size
            params[f"w_{name}"] = jnp.asarray(
                rng.randn(kh, kw, ci, co).astype(np.float32) * 0.2)
            params[f"b_{name}"] = jnp.asarray(
                rng.randn(co).astype(np.float32) * 0.2)
    net = EventNetwork(layer_defs, 16, 16, leak=0.01, alpha=0.1,
                       padding="SAME", conv_mode="full", stem_fusion=True)
    events = np.stack([rng.randint(0, 16, 40), rng.randint(0, 16, 40),
                       np.sort(rng.randint(1, 99, 40))], -1).astype(np.int32)
    chunks = pack_chunks(events, 16)
    rows = profile_layers_parallel(net, params, chunks, reps=1, dispatches=2)
    names = [n for n, _ in rows]
    # conv1+pool1 is a fused s2d pair in this net, probed as one row
    assert names == ["integrate", "conv1+pool1 (s2d)", "conv2", "TOTAL"]
    marginals = [ms for _, ms in rows[:-1]]
    assert abs(sum(marginals) - rows[-1][1]) < 1e-6

    net_d = EventNetwork(layer_defs, 16, 16, leak=0.01, alpha=0.1,
                         padding="SAME", conv_mode="dense")
    with pytest.raises(ValueError):
        profile_layers_parallel(net_d, params, chunks)


def test_pack_k_windows_are_distinct(bench_mod):
    """The chained timer must scan over DISTINCT chunk windows — identical
    windows would let XLA hoist the event-only work out of the timing
    loop and overstate throughput (bench.py _chained_events_per_sec)."""
    rng = np.random.RandomState(3)
    events = bench_mod.synth_stream(
        rng, bench_mod.DISPATCHES * bench_mod.T_CHUNKS, bench_mod.CAPACITY
    )
    chunks_k, n_events = bench_mod._pack_k(events, bench_mod.CAPACITY)
    k = chunks_k.y.shape[0]
    assert k == bench_mod.DISPATCHES
    ys = np.asarray(chunks_k.y)
    for i in range(1, k):
        assert not np.array_equal(ys[0], ys[i])
    # every real event is counted exactly once
    assert n_events == events.shape[0]


class _Seq:
    """Callable that pops scripted results; raising entries raise."""

    def __init__(self, *results):
        self.results = list(results)
        self.calls = 0

    def __call__(self, *a, **kw):
        self.calls += 1
        r = self.results.pop(0)
        if isinstance(r, Exception):
            raise r
        return r


def test_wait_for_backend_retries_through_outage(bench_mod, monkeypatch):
    """An UNAVAILABLE probe retries (with backend reset) until the service
    answers, inside the budget — the round-4 failure mode (BENCH_r04
    rc=1) must never recur as a silent single-shot abort."""
    probe = _Seq(RuntimeError("UNAVAILABLE: TPU backend setup"), 250.0, 1.0)
    resets = []
    monkeypatch.setattr(bench_mod, "_probe_device", probe)
    monkeypatch.setattr(bench_mod, "_reset_backend", lambda: resets.append(1))
    monkeypatch.setattr(bench_mod.time, "sleep", lambda s: None)
    bench_mod._BENCH_DEADLINE[0] = bench_mod.time.time() + 3600
    assert bench_mod._wait_for_backend() is None
    # attempt 1 errored, attempt 2 was slow-sick (250 s > 150 s first-probe
    # threshold... second probe threshold 45 s), attempt 3 healthy
    assert probe.calls == 3
    assert len(resets) == 2


def test_wait_for_backend_bounded_by_deadline(bench_mod, monkeypatch):
    """Past the wait budget the loop gives up and returns the last error
    string instead of spinning forever."""
    monkeypatch.setattr(
        bench_mod, "_probe_device",
        _Seq(RuntimeError("UNAVAILABLE: down"),
             RuntimeError("UNAVAILABLE: still down")))
    monkeypatch.setattr(bench_mod, "_reset_backend", lambda: None)
    bench_mod._BENCH_DEADLINE[0] = bench_mod.time.time() - 1.0
    err = bench_mod._wait_for_backend()
    assert err is not None and "UNAVAILABLE" in err


def test_resilient_recovers_midrun(bench_mod, monkeypatch):
    """A leg that dies mid-run (service drops during capture) is retried
    after the backend answers again; the result of the retry is returned."""
    monkeypatch.setattr(bench_mod, "_probe_device", lambda: 0.01)
    monkeypatch.setattr(bench_mod, "_reset_backend", lambda: None)
    bench_mod._BENCH_DEADLINE[0] = bench_mod.time.time() + 60
    leg = _Seq(RuntimeError("UNAVAILABLE: dropped"), (1234.5, 0.1, 0.0))
    assert bench_mod._resilient(leg) == (1234.5, 0.1, 0.0)
    assert leg.calls == 2


def test_main_degraded_emits_valid_json(bench_mod, monkeypatch, capsys):
    """When the backend never comes back inside the budget, main() still
    prints ONE parseable JSON line with degraded=true and returns (rc=0)
    — the driver contract the round-4 outage broke."""
    monkeypatch.setattr(bench_mod, "_wait_for_backend", lambda: "UNAVAILABLE: outage")
    monkeypatch.setattr(bench_mod, "bench_cpu_dense_proxy",
                        lambda *a, **k: (1000.0, 0.01))
    monkeypatch.setattr(bench_mod, "bench_cpu_async_baseline",
                        lambda *a, **k: 500.0)
    monkeypatch.setattr(bench_mod, "BENCH_MAX_WAIT_S", 0.0)
    bench_mod.main()
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert payload["degraded"] is True
    assert payload["metric"] == "events_per_sec_chip"
    assert payload["value"] == 0.0
    assert "UNAVAILABLE" in payload["reason"]
    assert payload["baseline_cpu_async_events_per_sec"] == 500.0
    # the load figure that flags a polluted (co-loaded) baseline draw
    assert payload["baseline_host_load_per_cpu"] >= 0.0
