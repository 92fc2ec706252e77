"""Backend-independent model-FLOP counting by walking the jaxpr.

XLA's executable ``cost_analysis()`` counts a ``lax.scan`` body ONCE, not
times its trip count, so scan-rolled models (``model.scan_blocks``) report
~6x too few FLOPs — and the driver benchmark would overstate headroom by the
same factor.  This walker descends into scan/while/cond/pjit calls,
multiplying scan bodies by their length, and counts the two FLOP-carrying
primitives that matter for conv nets (conv_general_dilated, dot_general) at
2 FLOPs per MAC.  Elementwise work is ignored (<1% for these models).
"""

from __future__ import annotations

import math

import jax
import numpy as np


def _dot_flops(eqn) -> float:
    a, b = eqn.invars[0].aval, eqn.invars[1].aval
    dims = eqn.params["dimension_numbers"]
    (lhs_c, rhs_c), (lhs_b, rhs_b) = dims
    batch = math.prod(a.shape[d] for d in lhs_b)
    k = math.prod(a.shape[d] for d in lhs_c)
    m = math.prod(a.shape[d] for d in range(len(a.shape))
                  if d not in lhs_b and d not in lhs_c)
    n = math.prod(b.shape[d] for d in range(len(b.shape))
                  if d not in rhs_b and d not in rhs_c)
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval  # filter
    dn = eqn.params["dimension_numbers"]
    spatial = math.prod(rhs.shape[d] for d in dn.rhs_spec[2:])
    in_ch = rhs.shape[dn.rhs_spec[1]]  # filter's input-channel dim is already per-group
    return 2.0 * math.prod(out.shape) * spatial * in_ch


def _jaxpr_flops(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * _jaxpr_flops(
                eqn.params["jaxpr"].jaxpr)
        elif name == "while":
            # trip count unknown statically; count one iteration of body
            total += _jaxpr_flops(eqn.params["body_jaxpr"].jaxpr)
        elif name == "cond":
            total += max((_jaxpr_flops(b.jaxpr)
                          for b in eqn.params["branches"]), default=0.0)
        else:
            for k in ("jaxpr", "call_jaxpr"):
                sub = eqn.params.get(k) if hasattr(eqn, "params") else None
                if sub is not None:
                    total += _jaxpr_flops(getattr(sub, "jaxpr", sub))
    return total


def count_flops(fn, *example_args) -> float:
    """Total FLOPs of one call of ``fn`` on abstract ``example_args``.

    Pure host-side tracing (jax.make_jaxpr) — no backend compile, works
    identically for scan-rolled and unrolled model variants.
    """
    def abstract(x):
        if isinstance(x, jax.ShapeDtypeStruct):
            return x
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return jax.ShapeDtypeStruct(np.shape(x), x.dtype)
        return x

    shapes = jax.tree_util.tree_map(abstract, example_args)
    jaxpr = jax.make_jaxpr(fn)(*shapes)
    return _jaxpr_flops(jaxpr.jaxpr)
