from async_ev_cnn_tpu.utils.checkpoint import (  # noqa: F401
    load_params,
    save_params,
    save_params_orbax,
)
from async_ev_cnn_tpu.utils.config import config, layers_dict  # noqa: F401
from async_ev_cnn_tpu.utils.nms import apply_nms, nms, nms_jax  # noqa: F401
from async_ev_cnn_tpu.utils.runner import (  # noqa: F401
    EventRunner,
    FrameRunner,
    MultiStreamRunner,
    ScanEventRunner,
)
