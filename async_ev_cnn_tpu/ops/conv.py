"""Dense 2-D convolution with TF-compatible padding.

The reference computes TF-style SAME pads at layer construction
(/root/reference/src/layers/conv2d.py:34-56) and shifts event coordinates by
the top/left pad.  We pin the identical pad formulas here and feed them to
``lax.conv_general_dilated`` as an explicit padding list so the dense path,
the active-mask dilation, and the sparse rulebook all share one definition.

All convs run in float32 on the MXU (``preferred_element_type=float32``);
state precision is what makes 10k-step async-vs-dense parity hold.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Module-wide MXU precision for every conv/GEMM touching async state.
# HIGHEST = full f32 passes (default; the <=1e-4 parity contract assumes
# it).  'default' lets the TPU demote operands to bf16 (~1e-2 relative
# error, ~20-25% faster end-to-end) — both network variants then share the
# same rounding so async-vs-dense parity still holds, but absolute fidelity
# to f32 references degrades.  Set via set_matmul_precision() or the CLI
# --matmul_precision flag.
_MATMUL_PRECISION = lax.Precision.HIGHEST


def set_matmul_precision(name: str) -> None:
    """Set the process-wide conv/GEMM operand precision.

    TRACE-TIME setting: the value is baked into each jitted program when
    it is first traced and is not part of any jit cache key — call this
    BEFORE building/running networks.  Changing it afterwards silently
    leaves already-compiled programs at their old precision (re-create
    the jitted callables, e.g. fresh model/network objects, to apply a
    new tier mid-process)."""
    global _MATMUL_PRECISION
    table = {
        "highest": lax.Precision.HIGHEST,
        "high": lax.Precision.HIGH,
        "default": lax.Precision.DEFAULT,
    }
    if name not in table:
        raise ValueError(f"matmul precision must be one of {sorted(table)}, got {name!r}")
    _MATMUL_PRECISION = table[name]


def matmul_precision():
    return _MATMUL_PRECISION


def tf_same_pads(in_h: int, in_w: int, k_h: int, k_w: int, stride: int):
    """TF SAME padding amounts ((top, bottom), (left, right)).

    Matches /root/reference/src/layers/conv2d.py:42-54 exactly.
    """
    if in_h % stride == 0:
        pad_along_h = max(k_h - stride, 0)
    else:
        pad_along_h = max(k_h - (in_h % stride), 0)
    if in_w % stride == 0:
        pad_along_w = max(k_w - stride, 0)
    else:
        pad_along_w = max(k_w - (in_w % stride), 0)
    pad_top = pad_along_h // 2
    pad_left = pad_along_w // 2
    return (pad_top, pad_along_h - pad_top), (pad_left, pad_along_w - pad_left)


def conv_pads(in_h: int, in_w: int, k_h: int, k_w: int, stride: int, padding: str):
    """Explicit pads for 'SAME' or 'VALID' padding."""
    if padding == "VALID":
        return (0, 0), (0, 0)
    if padding == "SAME":
        return tf_same_pads(in_h, in_w, k_h, k_w, stride)
    raise ValueError(f"padding must be 'SAME' or 'VALID', got {padding!r}")


def conv_out_shape(in_h: int, in_w: int, k_h: int, k_w: int, stride: int, padding: str):
    """Output spatial shape, matching conv2d.py:34-41."""
    if padding == "VALID":
        return (in_h - k_h) // stride + 1, (in_w - k_w) // stride + 1
    if padding == "SAME":
        return -(-in_h // stride), -(-in_w // stride)
    raise ValueError(f"padding must be 'SAME' or 'VALID', got {padding!r}")


def conv2d_dense(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None,
    stride: int = 1,
    padding: str = "VALID",
) -> jnp.ndarray:
    """Dense conv of ``x`` ``[..., C, H, W]`` with ``kernel`` ``[O, I, kh, kw]``.

    Accepts a single image ``[C, H, W]`` or a batch ``[N, C, H, W]``; the
    batch dim is how the runtime fuses the featuremap and conv-actfn convs of
    one async step into one MXU call (conv2d.py:118-123 runs them as two
    separate Cython+GEMM passes).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, _, in_h, in_w = x.shape
    o, i, k_h, k_w = kernel.shape
    pads = conv_pads(in_h, in_w, k_h, k_w, stride, padding)
    out = lax.conv_general_dilated(
        x.astype(jnp.float32),
        kernel.astype(jnp.float32),
        window_strides=(stride, stride),
        padding=pads,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
        precision=_MATMUL_PRECISION,
    )
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1).astype(jnp.float32)
    return out[0] if squeeze else out


def leaky_mask(surface: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """Leaky-ReLU as a multiplicative mask (conv2d.py:83-88)."""
    return jnp.where(surface > 0, jnp.float32(1), jnp.float32(alpha))


def leaky(x: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """Leaky-ReLU activation (functional.py:37-47)."""
    return jnp.maximum(x, x * jnp.float32(alpha))
