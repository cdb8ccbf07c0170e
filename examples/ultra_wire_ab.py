"""On-chip A/B of the 3 B/event ultra wire tier vs the 4 B compact tier
on the sustained file->device pipeline (bench.bench_sustained_pipeline —
the library serving engine end-to-end).

Protocol: the tunnel's bulk bandwidth swings ~2x minute-to-minute
(docs/performance.md "Sustained host->device pipeline"), so the legs
INTERLEAVE (ultra, compact, ultra, ...) and the report is per-tier
medians with min/max.  Expected on a link-bound pipe: the byte ratio,
~4/3 (+33%).  Run AFTER the service answers a tiny-matmul probe; each
leg is ~12 s + one fresh compile for the first ultra program.

STATUS / measured (2026-08-18, v5e via tunnel, 3 interleaved reps each):

  ultra   7.36 / 7.20 / 7.37 M ev/s at 21.8-22.4 MB/s (3.03 B/event)
  compact 5.67 / 7.37 / 6.98 M ev/s at 22.9-29.7 MB/s (4.03 B/event)
  medians 7.36M vs 6.98M -> ratio 1.055 (byte ratio predicts 1.333)

The mechanism is better than the median ratio: the ultra legs used only
~22 MB/s of a link that served 29.7 MB/s the same minute — the 3 B tier
un-link-bound the pipe, which now sits at the DEVICE ceiling
(~7.4M ev/s, the single-stream scan_parallel rate).  Compact ties only
when the link is healthy (29.7 MB/s x 1/4.03 B = 7.37M) and drops with
it (22.9 MB/s window: 5.67M vs ultra's 7.36M = 1.30x, the byte ratio).
The 4-stream serving shape (streams=4, chunks_per_dispatch=500) was
re-run the same way in a healthier-link window: both tiers tie at the
device ceiling (ultra 6.45/6.44/6.44M vs compact 6.40/6.44/6.44M,
identical 162 dispatches each) — compact sat exactly at the link edge
(26.0 MB/s used of ~26 available) while ultra needed only 19.5 MB/s,
i.e. the 3 B tier buys ~25% link headroom that converts to throughput
whenever the link droops below the device rate (as in the single-stream
weak-link window above).
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

import bench
from async_ev_cnn_tpu.utils.config import layers_dict

REPS = 3


def main():
    bench._enable_compilation_cache()
    layer_defs = layers_dict(bench.EFCN_DSL)
    params = bench.make_params(layer_defs, np.random.RandomState(0))
    # _wait_for_backend only retries while a deadline is set; without
    # one it returns after a single failed probe instead of waiting out
    # the documented multi-hour outage windows
    import time

    bench._BENCH_DEADLINE[0] = time.time() + bench.BENCH_MAX_WAIT_S
    err = bench._wait_for_backend()
    if err is not None:
        print(json.dumps({"ok": False, "reason": err}))
        return 1
    results = {"ultra": [], "compact": []}
    for rep in range(REPS):
        for tier in ("ultra", "compact"):
            eps, host_eps, mbps, n, _ = bench.bench_sustained_pipeline(
                params, layer_defs, seconds=12, force_wire=tier)
            row = {"tier": tier, "rep": rep,
                   "events_per_sec": round(eps, 1),
                   "wire_MBps": round(mbps, 2),
                   "B_per_event": round(mbps * 1e6 / eps, 2),
                   "dispatches": n}
            results[tier].append(eps)
            print(json.dumps(row), flush=True)
    med = {t: float(np.median(v)) for t, v in results.items()}
    print(json.dumps({
        "ultra_median": round(med["ultra"], 1),
        "compact_median": round(med["compact"], 1),
        "ratio": round(med["ultra"] / med["compact"], 3),
        "byte_ratio_prediction": round(4 / 3, 3),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
