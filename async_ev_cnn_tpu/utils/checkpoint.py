"""Model weight loading.

Honors the reference's checkpoint contract — variables named ``w_conv1``,
``b_conv1``, … ``w_fcN``/``b_fcN`` with HWIO conv kernels
(/root/reference/src/models/event_numpy.py:34-51,64) — from either:

* ``.npz`` archives (this framework's native format, written by
  ``save_params``), or
* legacy TensorFlow checkpoints.  TF checkpoints are read with the bundled
  pure-Python TensorBundle reader (``utils/tf_bundle.py``) so no TF
  dependency is required; if that fails and TensorFlow happens to be
  importable, it is used as a fallback (mirroring
  ``checkpoint_utils.load_checkpoint``).

Latest-checkpoint resolution when a directory is given matches
event_numpy.py:37-40.
"""

from __future__ import annotations

import os
import tempfile
from typing import Dict

import numpy as np


def _atomic_savez(path: str, arrays: Dict[str, np.ndarray]) -> None:
    """Write an ``.npz`` atomically: temp file in the same directory, then
    ``os.replace``.  A crash mid-write (the exact scenario periodic
    checkpointing exists for) can otherwise leave a truncated archive as
    the only copy of the run's state."""
    # Write the EXACT path given (np.savez only appends ".npz" for str
    # targets; we hand it a file object).  Appending created a save/load
    # asymmetry: save_stream_state('state.ckpt') wrote state.ckpt.npz and
    # the restore's os.path.exists('state.ckpt') never fired.  The temp
    # suffix must NOT end in '.npz' or latest_checkpoint resurrects a
    # crashed write's truncated archive as the newest checkpoint.
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(os.path.abspath(path)), suffix=".tmp"
    )
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise


def latest_checkpoint(path: str) -> str:
    """Resolve a directory to its newest checkpoint prefix.

    Understands TF's ``checkpoint`` index file when present; otherwise picks
    the newest ``*.npz`` or ``*.index`` (minus suffix) by mtime.
    """
    if not os.path.isdir(path):
        return path
    marker = os.path.join(path, "checkpoint")
    if os.path.exists(marker):
        with open(marker) as f:
            for line in f:
                if line.startswith("model_checkpoint_path"):
                    name = line.split(":", 1)[1].strip().strip('"')
                    return name if os.path.isabs(name) else os.path.join(path, name)
    candidates = []
    for fn in os.listdir(path):
        full = os.path.join(path, fn)
        if fn.endswith(".tmp.npz"):
            continue  # leftover from a crashed pre-fix atomic write
        if fn.endswith(".npz"):
            candidates.append((os.path.getmtime(full), full))
        elif fn.endswith(".index"):
            candidates.append((os.path.getmtime(full), full[: -len(".index")]))
    if not candidates:
        raise FileNotFoundError(f"no checkpoints found under {path}")
    return max(candidates)[1]


def _load_tf_checkpoint(prefix: str) -> Dict[str, np.ndarray]:
    try:
        from async_ev_cnn_tpu.utils.tf_bundle import load_tensor_bundle

        return load_tensor_bundle(prefix)
    except Exception as bundle_err:  # pragma: no cover - fallback path
        try:
            import tensorflow as tf  # type: ignore

            reader = tf.train.load_checkpoint(prefix)
            return {
                key: np.asarray(reader.get_tensor(key))
                for key in reader.get_variable_to_shape_map()
            }
        except ImportError:
            raise bundle_err


def load_params(path: str, restrict_vars=None) -> Dict[str, np.ndarray]:
    """Load a weight dict from an .npz file, TF checkpoint (file or dir),
    or Orbax checkpoint directory."""
    if os.path.isdir(path) and (
        os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA"))
        or os.path.exists(os.path.join(path, "_METADATA"))
    ):
        params = load_params_orbax(path)
        if restrict_vars is not None:
            params = {k: v for k, v in params.items() if k in restrict_vars}
        return params
    path = latest_checkpoint(path)
    def _is_npz(p):
        if p.endswith(".npz"):
            return True
        try:  # extension-free .npz (save_params writes the exact path)
            with open(p, "rb") as f:
                return f.read(4) == b"PK\x03\x04"
        except OSError:
            return False

    if _is_npz(path):
        with np.load(path) as z:
            params = {k: z[k] for k in z.files}
    else:
        params = _load_tf_checkpoint(path)
    if restrict_vars is not None:
        # match flat names for object-graph checkpoints too, where raw
        # keys are 'name/.ATTRIBUTES/VARIABLE_VALUE' (else restriction
        # silently returns an empty dict)
        params = {
            k: v for k, v in params.items()
            if k in restrict_vars
            or k.split("/.ATTRIBUTES/")[0] in restrict_vars
        }
    return params


def normalize_names(params: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Map object-graph checkpoint names to flat Saver-style names.

    ``tf.train.Saver`` checkpoints (the reference's format,
    frame_tf.py:32-61) already use flat names like ``w_conv1``;
    ``tf.train.Checkpoint`` stores ``w_conv1/.ATTRIBUTES/VARIABLE_VALUE``.
    Both normalize to the flat name.
    """
    out = {}
    for key, value in params.items():
        name = key.split("/.ATTRIBUTES/")[0] if "/.ATTRIBUTES/" in key else key
        out.setdefault(name, value)
    return out


def save_params(path: str, params: Dict[str, np.ndarray]) -> None:
    """Save weights in this framework's native .npz format (atomically)."""
    _atomic_savez(path, {k: np.asarray(v) for k, v in params.items()})


def save_params_tf(prefix: str, params: Dict[str, np.ndarray]) -> None:
    """Write weights as a TF v2 checkpoint (pure Python, readable by
    TensorFlow) — exports trained weights back to users of the reference."""
    from async_ev_cnn_tpu.utils.tf_bundle import save_tensor_bundle

    save_tensor_bundle(prefix, {k: np.asarray(v) for k, v in params.items()})


def save_params_orbax(directory: str, params) -> None:
    """Save a weight pytree as an Orbax checkpoint (the JAX-ecosystem
    format, for interop with flax/optax training stacks)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.abspath(directory),
            {k: np.asarray(v) for k, v in params.items()},
            force=True,
        )


def load_params_orbax(directory: str) -> Dict[str, np.ndarray]:
    """Load a weight dict from an Orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(directory))
    return {k: np.asarray(v) for k, v in restored.items()}


def save_stream_state(path: str, state) -> None:
    """Persist an :class:`EventNetwork` state pytree (single-stream or
    stream-batched) to one ``.npz`` — the serving-side analog of the
    reference's reader save/restore (event_reader.py:778-820): weights,
    reader cursors, AND now the in-flight stream state (surfaces,
    timestamps, layer featuremaps) can all round-trip a process restart.
    """
    import jax

    leaves = jax.tree.leaves(state)
    _atomic_savez(path, {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def restore_stream_state(path: str, like):
    """Restore a state pytree saved by :func:`save_stream_state` into the
    structure of ``like`` (e.g. ``net.init_state(params)`` — the treedef
    is not serialized, the network spec defines it).  Shapes and dtypes
    are validated leaf-by-leaf."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(like)
    with np.load(path) as z:
        arrs = [z[f"leaf_{i}"] for i in range(len(z.files))]
    if len(arrs) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(arrs)} leaves, structure needs {len(leaves)}"
        )
    out = []
    for i, (a, l) in enumerate(zip(arrs, leaves)):
        if tuple(a.shape) != tuple(jnp.shape(l)):
            raise ValueError(
                f"leaf {i}: checkpoint shape {a.shape} != structure "
                f"shape {jnp.shape(l)}"
            )
        # the leaf's own dtype, not jnp.asarray(l).dtype — the latter would
        # x64-demote a float64 structure leaf and mask the mismatch
        want = np.asarray(l).dtype
        if a.dtype != want:
            # the round-trip contract is bit-identical; silently casting
            # would mask a wrong-dtype checkpoint
            raise ValueError(
                f"leaf {i}: checkpoint dtype {a.dtype} != structure "
                f"dtype {want}"
            )
        j = jnp.asarray(a)
        if j.dtype != a.dtype:
            # default x64-disabled JAX demotes int64/float64 leaves on
            # asarray — values >= 2**31 would wrap silently, the exact
            # corruption the strict dtype check above exists to prevent
            raise ValueError(
                f"leaf {i}: JAX demoted {a.dtype} to {j.dtype} on "
                "restore (x64 disabled); store the leaf as a 32-bit "
                "dtype or enable jax_enable_x64"
            )
        out.append(j)
    return jax.tree.unflatten(treedef, out)
