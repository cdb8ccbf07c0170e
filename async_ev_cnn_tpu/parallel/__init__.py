from async_ev_cnn_tpu.parallel.streams import MultiStreamEngine, make_mesh  # noqa: F401
