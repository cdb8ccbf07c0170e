"""One-off probe: where does multi-stream serving saturation actually
knee?  The bench sweep stops at S=64, where the f32-act curve was still
rising ~5% per doubling (BENCH_r05 / docs/performance.md); this extends
both activation-dtype curves to S=96 and S=128 on the real chip so the
published envelope has a measured top, without adding two more
compile-heavy legs to the driver's bench run.

STATUS / measured (2026-08-18, v5e via tunnel, headline tier,
median-of-5 chained K=8 timings per leg):

  f32-act : S=64 12.73M ev/s (64.4 ms/dispatch), S=96 12.39M (99.1 ms),
            S=128 RESOURCE_EXHAUSTED -> the f32 envelope PEAKS at S=64,
            matching the bench sweep's 12.8M record.
  bf16-act: S=96 18.28M (67.2 ms), S=128 19.58M (83.7 ms),
            S=192 18.46M (133 ms), S=256 unreachable (the tunnel's
            remote-compile request exceeds its HTTP body limit)
            -> the bf16 envelope PEAKS at S=128 ~ 19.6M ev/s/chip,
            ~1.13x the S=64 sweep record (17.4M).

The bench serving sweep's bf16 variant now includes S=128 so the
driver-verified JSON carries the true peak (its compile is cached).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import bench
from async_ev_cnn_tpu.utils.config import layers_dict


def main():
    bench._enable_compilation_cache()
    from async_ev_cnn_tpu.ops.conv import set_matmul_precision

    set_matmul_precision(bench.HEADLINE_PRECISION)
    layer_defs = layers_dict(bench.EFCN_DSL)
    rng = np.random.RandomState(0)
    params = bench.make_params(layer_defs, rng)
    events = bench.synth_stream(
        rng, bench.DISPATCHES * bench.T_CHUNKS, bench.CAPACITY)

    bench._BENCH_DEADLINE[0] = time.time() + bench.BENCH_MAX_WAIT_S
    err = bench._wait_for_backend()
    if err is not None:
        print(json.dumps({"ok": False, "reason": err}))
        return 1
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--acts", default="float32,bfloat16")
    ap.add_argument("--streams", default="64,96,128")
    opts = ap.parse_args()
    for act in opts.acts.split(","):
        for s in (int(v) for v in opts.streams.split(",")):
            try:
                eps, lat, spread = bench.bench_tpu_serving(
                    params, layer_defs, events, n_streams=s,
                    activation_dtype=act)
            except Exception as e:  # e.g. RESOURCE_EXHAUSTED past the knee
                print(json.dumps({
                    "activation_dtype": act, "streams": s,
                    "error": f"{type(e).__name__}: {str(e)[:160]}",
                }), flush=True)
                bench._reset_backend()
                if bench._wait_for_backend() is not None:
                    return 1
                continue
            print(json.dumps({
                "activation_dtype": act, "streams": s,
                "events_per_sec": round(eps, 1),
                "latency_ms_per_dispatch": round(lat * 1e3, 3),
                "spread": round(spread, 3),
            }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
