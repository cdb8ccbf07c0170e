from async_ev_cnn_tpu.ops.conv import conv2d_dense, tf_same_pads, conv_out_shape  # noqa: F401
from async_ev_cnn_tpu.ops.masks import dilate_mask, window_view, pool_out_shape  # noqa: F401
from async_ev_cnn_tpu.ops.integrate import integrate_step, integrate_frame  # noqa: F401
from async_ev_cnn_tpu.ops.pool import composite_argmax, maxpool_dense  # noqa: F401
