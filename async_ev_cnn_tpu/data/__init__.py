from async_ev_cnn_tpu.data import detection_reader, event_reader, file_reader  # noqa: F401
from async_ev_cnn_tpu.data.file_reader import AerReader, NReader, NumpyReader  # noqa: F401
from async_ev_cnn_tpu.data.event_reader import EventDataset  # noqa: F401
from async_ev_cnn_tpu.data.detection_reader import DetectionDataset  # noqa: F401
