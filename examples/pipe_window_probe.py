"""One-off probe: does un-windowing the sustained pipeline's dispatch
lift the end-to-end file->device rate toward the link bound?

The sustained pipeline already carries 1000 chunks per dispatch, but
its ``scan_parallel`` runs windowed at T=200 — five sequential window
bodies per dispatch, each paying the window's scan prologue and the
activation working-set round trip.  The T-scaling probe
(examples/t_scaling_probe.py) showed the same network does 12.9M ev/s
at T=800 and 14.4M at T=1600 f32 when the time batch is one window —
while the pipe measures 7.2-7.4M ("the device ceiling" at the T=200
window).  The ultra wire leaves link headroom to ~9.7M ev/s
(29 MB/s / 3 B), so the window — not the link — may now be the pipe's
binding stage.

Protocol: ``bench.bench_sustained_pipeline`` (the exact driver leg)
with window in {200 (shipped), 500, None (one batch per dispatch)},
interleaved in one process so link-weather drift cannot masquerade as
a window effect.

STATUS / measured (2026-08-19, v5e via tunnel, headline tier, 12 s
legs x 2 interleaved rounds, link strong that window — 27-36 MB/s):

  round 1: W=200 11.44M ev/s @34.7 MB/s | W=500 11.79M @35.7 | W=None 10.24M @31.0
  round 2: W=200 11.25M @34.1          | W=500 10.94M @33.2 | W=None  9.02M @27.4

NEGATIVE (for un-windowing): the pipe is link-bound — every leg sits
at exactly link_MBps / 3.03 B/event, so throughput differences ARE
achieved-link differences — and the un-windowed dispatch consistently
achieves the LOWEST link rate (-12-20%), with W=500 a wash vs W=200.
Mechanism: one 1000-chunk un-windowed program runs ~70+ ms on device
with no interior boundary, and the host's next uploads contend with
the running program's HBM traffic less smoothly than the windowed
variant's five 200-chunk segments; at equal weather the coarser
dispatch simply keeps the link less busy.  The shipped driver leg
stays ``window=200``.  Side finding: the same-day full-protocol run
measured the pipe at 10.7-11.8M ev/s (32-36 MB/s link weather) — the
ultra-wire pipe tracks the link rate, not a ~7.4M device ceiling as
the round-5 ultra A/B (weak-link morning) had suggested.

ULTRA4 RE-PROBE (2026-08-19 01:22, ad-hoc run of the same protocol
with windows {200, 500, 1000} once `wire='auto'` negotiated the
2.5 B/event ultra4 tier): W=200 11.09/11.61M, W=500 11.42/10.49M,
W=1000 11.60/7.54M (weather degraded through rep 2) — medians
11.35/10.96/9.57M, every leg at link_MBps/2.53.  Same conclusion at
the thinner tier: the pipe is link-bound, W=200 stands, larger
windows only add variance.  docs/performance.md "Ultra4 wire tier"
has the write-up and the entropy-floor analysis that closes the wire
chapter.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import bench


def main():
    bench._enable_compilation_cache()
    from async_ev_cnn_tpu.ops.conv import set_matmul_precision
    from async_ev_cnn_tpu.utils.config import layers_dict

    import numpy as np

    set_matmul_precision(bench.HEADLINE_PRECISION)
    layer_defs = layers_dict(bench.EFCN_DSL)
    params = bench.make_params(layer_defs, np.random.RandomState(0))

    bench._BENCH_DEADLINE[0] = time.time() + bench.BENCH_MAX_WAIT_S
    err = bench._wait_for_backend()
    if err is not None:
        print(json.dumps({"ok": False, "reason": err}))
        return 1
    for rnd in (1, 2):  # two interleaved rounds: link weather drifts
        for window in (200, 500, None):
            eps, host_eps, mbps, n_disp, _ = bench.bench_sustained_pipeline(
                params, layer_defs, seconds=12, window=window)
            print(json.dumps({
                "round": rnd, "window": window,
                "events_per_sec": round(eps, 1),
                "wire_MBps": round(mbps, 2),
                "dispatches": n_disp,
            }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
