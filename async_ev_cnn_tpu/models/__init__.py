from async_ev_cnn_tpu.models.yolo import YoloEventJax, YoloFrameJax, YoloFrameNumpy  # noqa: F401
