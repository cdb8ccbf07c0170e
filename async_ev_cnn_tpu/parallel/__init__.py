from async_ev_cnn_tpu.parallel.streams import MultiStreamEngine, make_mesh  # noqa: F401
from async_ev_cnn_tpu.parallel.time_shard import TimeShardEngine, make_time_mesh  # noqa: F401
