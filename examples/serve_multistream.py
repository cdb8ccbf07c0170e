"""Multi-stream serving example: N independent event streams, one mesh.

    python examples/serve_multistream.py

Shards stream state over the available devices (data axis) with conv
channels optionally tensor-parallel; each step advances every stream by one
micro-batch.  Runs on a single chip, an 8-device CPU mesh, or a pod slice
unchanged.
"""

import numpy as np
import jax
import jax.numpy as jnp

from async_ev_cnn_tpu.layers.network import EventNetwork
from async_ev_cnn_tpu.parallel import MultiStreamEngine, make_mesh
from async_ev_cnn_tpu.utils.config import layers_dict
from async_ev_cnn_tpu.layers.types import EventChunk


def main():
    rng = np.random.RandomState(0)
    dsl = "conv1=3,3,1,8 pool1=2,2 conv2=3,3,8,16 pool2=2,2 conv3=1,1,16,13"
    layers = layers_dict(dsl)
    params = {}
    for name, size in layers.items():
        if "conv" in name:
            kh, kw, ci, co = size
            params[f"w_{name}"] = jnp.asarray(rng.randn(kh, kw, ci, co).astype(np.float32) * 0.2)
            params[f"b_{name}"] = jnp.asarray(rng.randn(co).astype(np.float32) * 0.05)

    net = EventNetwork(layers, 32, 32, leak=1e-4, alpha=0.1, padding="SAME")
    n_dev = jax.device_count()
    mesh = make_mesh(n_data=n_dev, n_model=1)
    print(f"mesh: {dict(mesh.shape)} over {n_dev} device(s)")

    n_streams = n_dev * 2
    eng = MultiStreamEngine(net, mesh)
    p = eng.place_params(params)
    states = eng.init_states(p, n_streams)

    def random_chunk():
        e = 64
        return EventChunk(
            y=jnp.asarray(rng.randint(0, 32, (n_streams, e)), jnp.int32),
            x=jnp.asarray(rng.randint(0, 32, (n_streams, e)), jnp.int32),
            ts=jnp.asarray(np.sort(rng.randint(0, 1000, (n_streams, e)), axis=1)
                           + np.arange(n_streams)[:, None] * 0, jnp.int32),
            p=jnp.zeros((n_streams, e), jnp.int32),
            valid=jnp.ones((n_streams, e), bool),
        )

    ts_base = np.zeros(n_streams, np.int64)
    for step in range(5):
        chunk = random_chunk()
        chunk = chunk._replace(ts=chunk.ts + jnp.asarray(ts_base[:, None], jnp.int32))
        ts_base += 1000
        states, grids = eng.step(p, states, eng.place_chunks(chunk))
        grids = np.asarray(grids)
        print(f"step {step}: per-stream grid outputs {grids.shape}, "
              f"mean |out| = {np.abs(grids).mean():.4f}")
        if step == 2:
            # serving survives a process restart: checkpoint the in-flight
            # stream state mid-run and restore it bit-identically
            import os
            import tempfile

            from async_ev_cnn_tpu.utils.checkpoint import (
                restore_stream_state,
                save_stream_state,
            )

            fd, ckpt = tempfile.mkstemp(suffix=".npz")
            os.close(fd)
            save_stream_state(ckpt, states)
            states = jax.device_put(  # re-place with the stream shardings
                restore_stream_state(ckpt, states), eng.state_shardings()
            )
            print(f"  (stream state checkpointed + restored from {ckpt})")

    # ---- throughput mode: full-recompute net, parallel-in-time ----------
    # Each stream's T chunks are executed as one time-batched program
    # (associative-scan surfaces + batched forward) — the fastest exact
    # path below the ~0.3 MPix crossover (docs/performance.md).
    net_full = EventNetwork(layers, 32, 32, leak=1e-4, alpha=0.1,
                            padding="SAME", conv_mode="full")
    eng_full = MultiStreamEngine(net_full, mesh)
    p_full = eng_full.place_params(params)
    states_full = eng_full.init_states(p_full, n_streams)
    t_chunks = 8

    def chunk_at(t):
        c = random_chunk()
        return c._replace(ts=c.ts + jnp.int32(1000 * (t + 5)))

    chunks_ts = jax.tree.map(
        lambda *xs: jnp.stack(xs, axis=0),
        *[chunk_at(t) for t in range(t_chunks)],
    )
    states_full, grids = eng_full.scan_parallel(
        p_full, states_full, eng_full.place_chunks(chunks_ts, leading_time=True)
    )
    grids = np.asarray(grids)
    print(f"parallel-in-time: {t_chunks} chunks x {n_streams} streams -> "
          f"outputs {grids.shape}, mean |out| = {np.abs(grids).mean():.4f}")

    # ---- sequence parallelism: ONE stream's time axis over all devices --
    # The max-plus surface recurrence is associative, so a single stream
    # scales across chips: local scans + one all_gather prefix composition
    # (parallel/time_shard.py).  Use when one stream's latency/throughput
    # matters more than aggregate serving.
    from async_ev_cnn_tpu.parallel import TimeShardEngine, make_time_mesh

    n_dev = len(jax.devices())
    t_total = 2 * n_dev
    eng_sp = TimeShardEngine(net_full, make_time_mesh(n_dev))
    one_stream = jax.tree.map(
        lambda *xs: jnp.stack(xs, axis=0),
        *[chunk_at(t) for t in range(t_total)],
    )
    # single stream: drop the stream axis from the random chunks
    one_stream = jax.tree.map(lambda a: a[:, 0], one_stream)
    st_sp, grids_sp = eng_sp.scan_parallel(
        params, net_full.init_state(params), one_stream
    )
    print(f"time-sharded single stream: {t_total} chunks over {n_dev} "
          f"devices -> outputs {np.asarray(grids_sp).shape}")


if __name__ == "__main__":
    main()
