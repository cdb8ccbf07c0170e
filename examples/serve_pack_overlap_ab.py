"""On-chip A/B: producer-side :meth:`StreamingPipeline.prepare` vs
consumer-inline packing on the serving loop.

The serve CLI originally pre-packed in its producer thread; the round-5
endless-feed rebase moved items to raw arrays, which serve() then packed
INLINE in the serial dispatch loop — serializing ~11-19M ev/s of host
pack work against the multi-M ev/s device pipe.  ``prepare()`` moves
rebase+pack back into the producer.  This script measures both source
shapes on the real chip, interleaved (the tunnel's bandwidth swings
minute-to-minute), same dispatch program for both legs.

Hypothesis under test: with pack at ~P ev/s and the pipe at ~D ev/s,
inline packing serializes to ~1/(1/P + 1/D) while the prepared leg
runs at min(P, D) — a ~25-35% gap for P ~ 2x D.

STATUS / measured (2026-08-18, v5e via tunnel, 3 interleaved reps each):

  prepared 7.61 / 7.17 / 8.03 M ev/s   (median 7.61M)
  inline   7.77 / 6.69 / 8.57 M ev/s   (median 7.77M)
  ratio prepared/inline = 0.98 — NO significant difference.

The serialization model was WRONG for this engine: dispatch enqueue is
asynchronous and the consumer loop blocks only at the watermark fetch
(one per ``max_in_flight/2`` dispatches), so inline pack work fills
time the host would otherwise spend waiting at the fetch — the
in-flight window overlaps it for free.  Inline packing binds only when
the host pack rate drops BELOW the device rate (P < D); here P ~ 15M
vs D ~ 7.6M ev/s.  prepare() is kept as the CLI's source shape anyway:
it is the only correct producer-side pre-pack for rebased endless
feeds (a bare wire tuple cannot carry the epoch deltas), and it buys
headroom on slower hosts / many-stream dispatches where S packs per
dispatch can push the consumer past the device rate.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import bench
from async_ev_cnn_tpu.utils.config import layers_dict
from async_ev_cnn_tpu.utils.serving import StreamingPipeline, threaded_source

REPS = 3
SECONDS = 12
CHUNKS = 1000  # chunks per dispatch (matches bench_sustained_pipeline)
FILES = 8


def run_leg(net, params, arrays, mode):
    pipe = StreamingPipeline(net, params, capacity=bench.CAPACITY,
                             window=bench.T_PARALLEL, max_in_flight=16,
                             wire="auto", t_chunks=CHUNKS)
    fn = (lambda ev: pipe.prepare(ev)) if mode == "prepared" else None
    # warm compile outside the timed window
    warm = pipe.prepare(arrays[0]) if mode == "prepared" else arrays[0]
    for _ in pipe.serve([warm]):
        pass
    deadline = [None]

    def gen():
        i = 0
        while deadline[0] is None or time.time() < deadline[0]:
            yield arrays[i % len(arrays)]
            i += 1

    src = threaded_source(gen, fn=fn, depth=3, threads=1)
    t0 = time.time()
    deadline[0] = t0 + SECONDS
    n = 0
    for res in pipe.serve(src):
        n += res.n_events
    return n / (time.time() - t0)


def main():
    bench._enable_compilation_cache()
    from async_ev_cnn_tpu.ops.conv import set_matmul_precision

    set_matmul_precision(bench.HEADLINE_PRECISION)
    layer_defs = layers_dict(bench.EFCN_DSL)
    rng = np.random.RandomState(0)
    params = bench.make_params(layer_defs, rng)
    arrays = [bench.clustered_stream(rng, CHUNKS, bench.CAPACITY)
              for _ in range(FILES)]
    net = bench._net(layer_defs, "full")

    bench._BENCH_DEADLINE[0] = time.time() + bench.BENCH_MAX_WAIT_S
    err = bench._wait_for_backend()
    if err is not None:
        print(json.dumps({"ok": False, "reason": err}))
        return 1
    results = {"prepared": [], "inline": []}
    for rep in range(REPS):
        for mode in ("prepared", "inline"):
            eps = run_leg(net, params, arrays, mode)
            results[mode].append(eps)
            print(json.dumps({"mode": mode, "rep": rep,
                              "events_per_sec": round(eps, 1)}), flush=True)
    med = {m: float(np.median(v)) for m, v in results.items()}
    print(json.dumps({
        "prepared_median": round(med["prepared"], 1),
        "inline_median": round(med["inline"], 1),
        "ratio": round(med["prepared"] / med["inline"], 3),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
