"""async-ev-cnn-tpu: a TPU-native (JAX/XLA/Pallas) event-camera CNN framework.

A from-scratch re-design of the capabilities of marcocannici/async-ev-cnn
(CVPR-W 2019, "Asynchronous Convolutional Networks for Object Detection in
Neuromorphic Cameras") for TPU hardware.

Design notes (TPU-first, not a port):

* The reference propagates variable-length event *coordinate lists* between
  layers (``/root/reference/src/layers/layer.py:38-44``) and extracts
  receptive-field columns with a Cython kernel
  (``src/libs/cutils.pyx:26-134``).  Dynamic shapes defeat XLA, so this
  framework propagates **dense boolean active-site masks** ``[H, W]``
  instead: the ``im2col_event`` dedup-dilation becomes a single
  ``lax.reduce_window`` max, incremental updates become masked selects that
  XLA fuses into the convs, and every shape is static so the whole network
  step compiles once and runs under ``lax.scan``.
* The hot compute (conv around active sites) rides the MXU either as a
  full ``lax.conv_general_dilated`` with masked commit ("dense" mode) or as
  a padded active-site rulebook gather -> GEMM -> scatter ("sparse" mode,
  Pallas-backed) for very sparse regimes.
* Multi-stream serving shards independent event streams over a
  ``jax.sharding.Mesh`` (data-parallel over streams, replicated weights) —
  the only parallelism the capability set calls for, since state at chunk
  ``t`` depends on ``t-1`` within a stream.
"""

__version__ = "0.1.0"

from async_ev_cnn_tpu.layers.types import EventChunk, LayerIO  # noqa: F401
