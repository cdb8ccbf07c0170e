"""Deterministic floating-point fences for stateful event-driven updates.

The async algorithm branches on exact signs of accumulated float values: a
surface/featuremap site that flips positive -> non-positive must emit an
event, and the activation mask used for leak propagation must agree with the
stored value's sign (conv2d.py:113-131 in the reference).  Under XLA this is
fragile: the compiler freely *duplicates* cheap elementwise arithmetic into
multiple consumer fusions, and each fusion may or may not FMA-contract a
``mul`` into a following ``add``/``sub``.  Two copies of ``s - dt*leak``
then differ by 1 ulp (e.g. ``0.6 - 6*0.1`` is ``0.0`` plain but ``1.49e-8``
contracted), the sign tests disagree between the stored state and the
activation mask derived from "the same" value, and the async network silently
desynchronises from the dense oracle (observed: transient O(bias) errors).
``lax.optimization_barrier`` does not help — the CPU backend strips it.

``snap`` makes this impossible by construction: every product that feeds an
accumulation is rounded to a ``2**-20`` grid with

    snap(x) = round(x * 2**20) * 2**-20

All three ops are individually deterministic and the pattern is immune to
the only fusion-dependent rewrite (FMA contraction):

* ``x * 2**20`` and ``r * 2**-20`` are power-of-two scalings — exact, never
  rounded, so contracting the final mul into a consumer add is harmless.
* ``round`` (half-to-even) is exact and blocks algebraic simplification, so
  the inner product's rounding can never be skipped.

As a bonus, all integration-surface values land on the common grid, so the
surface arithmetic is *exact* fixed-point-in-float (values < 16 = 2^24 ulps)
and zero crossings are bit-stable.  The ``2**-20 ~= 1e-6`` quantisation is
far below the 1e-4 async-vs-dense parity budget, and both the async layers
and the dense oracle consume identically-snapped deltas, so parity itself is
unaffected.
"""

from __future__ import annotations

import jax.numpy as jnp

SNAP_BITS = 20
_UP = jnp.float32(2.0**SNAP_BITS)
_DOWN = jnp.float32(2.0**-SNAP_BITS)


def snap(x):
    """Round to the 2**-20 grid; a fusion-proof rounding point (see module
    docstring).  Use on every rounded product that feeds an accumulation in
    state-carrying code."""
    return jnp.round(x * _UP) * _DOWN
