from async_ev_cnn_tpu.layers.types import (  # noqa: F401
    ConvState,
    EventChunk,
    IntegrationState,
    LayerIO,
    PoolState,
)
from async_ev_cnn_tpu.layers.integration import IntegrationSpec, integration_init, integration_step  # noqa: F401
from async_ev_cnn_tpu.layers.conv2d import ConvSpec, conv_init, conv_step  # noqa: F401
from async_ev_cnn_tpu.layers.maxpool import PoolSpec, pool_init, pool_step  # noqa: F401
from async_ev_cnn_tpu.layers.network import EventNetwork, dense_forward  # noqa: F401
