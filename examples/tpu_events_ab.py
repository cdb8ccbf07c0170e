"""On-chip A/B of the integrate engines (round 4).

Phase 1 (smoke): the event-scatter kernel must compile under Mosaic and
produce BIT-IDENTICAL outputs to the ts-map kernel on the real chip
(both claim exact equality to the sequential chain; scalar fetch only).

Phase 2 (A/B): whole-step eFCN scan_parallel timings at T=200 under the
bench protocol (median-of-5 x 8 chained dispatches, fresh chunks per
step, single scalar fetch) for engines pallas (event-scatter),
pallas_tsmap (round 3), xla (max-plus associative scan).  The
engine-to-engine difference of whole-step medians IS the stage
attribution (in-process A/B doctrine, docs/performance.md).

Run on the TPU (no JAX_PLATFORMS override); uses /tmp/jax_comp_cache.
"""

import json

import numpy as np

import bench  # repo-root bench.py: protocol + model helpers


def main():
    import jax
    import jax.numpy as jnp

    defs = __import__(
        "async_ev_cnn_tpu.utils.config", fromlist=["layers_dict"]
    ).layers_dict(bench.EFCN_DSL)
    rng = np.random.RandomState(0)
    params = bench.make_params(defs, rng)
    events = bench.synth_stream(
        rng, bench.DISPATCHES * bench.T_PARALLEL, bench.CAPACITY
    )

    net = bench._net(defs, "full")
    jp = {k: jnp.asarray(v) for k, v in params.items()}
    state = net.init_state(jp)
    chunks, n_events = bench._pack_k(events, bench.CAPACITY)

    # ---- phase 1: on-chip exactness smoke (small T, fast compile) -------
    small = jax.tree.map(lambda a: a[0][:16], chunks)

    @jax.jit
    def diff(st, cs):
        _, o1 = net.scan_parallel(jp, st, cs, integrate_engine="pallas")
        _, o2 = net.scan_parallel(jp, st, cs, integrate_engine="pallas_tsmap")
        return jnp.max(jnp.abs(o1 - o2))

    d = float(diff(state, small))
    print(json.dumps({"phase": "smoke", "events_vs_tsmap_max_diff": d}))
    assert d == 0.0, "event-scatter engine is not bit-exact on-chip"

    # ---- phase 2: whole-step A/B ---------------------------------------
    for engine in ("pallas", "pallas_tsmap", "xla"):
        fn = jax.jit(
            lambda s, c, e=engine: net.scan_parallel(jp, s, c,
                                                     integrate_engine=e)
        )
        eps, dt, spread = bench._chained_events_per_sec(
            fn, state, chunks, n_events
        )
        print(json.dumps({
            "engine": engine,
            "events_per_sec": round(eps, 1),
            "ms_per_dispatch": round(dt / bench.DISPATCHES * 1e3, 2),
            "spread": round(spread, 3),
        }))


if __name__ == "__main__":
    main()
