"""Static MXU FLOP counting by walking a jaxpr.

XLA's post-compile cost model counts loop bodies ONCE (a scan over 250
timesteps reports 1/250th of the real work), so it cannot account for the
recurrent families. This walker counts ``dot_general`` / ``conv_general_dilated``
FLOPs from the traced jaxpr and multiplies ``scan`` bodies by their trip count
— an exact static count of the matmul/conv work (2 FLOPs per MAC), the same
convention as the roofline analyses in NOTES.md. Elementwise work is excluded
(it rides the VPU, not the MXU), so MFU percentages derived from this count
are conservative.

Used by ``bench.py`` to carry ``flops_per_sec``/``mfu_pct`` on every family's
line and make the peak-plausibility guard non-vacuous beyond WaveNet
(round-3 verdict item 2).
"""

import math
from typing import Any

import jax
import numpy as np

__all__ = ["count_flops", "jaxpr_flops"]


def _prod(xs) -> float:
    out = 1.0
    for x in xs:
        out *= float(x)
    return out


def _dot_general_flops(eqn) -> float:
    lhs, rhs = (v.aval.shape for v in eqn.invars[:2])
    (lhs_c, rhs_c), (lhs_b, _rhs_b) = eqn.params["dimension_numbers"]
    batch = _prod(lhs[d] for d in lhs_b)
    contract = _prod(lhs[d] for d in lhs_c)
    lhs_free = _prod(lhs[d] for d in range(len(lhs)) if d not in set(lhs_c) | set(lhs_b))
    rhs_free = _prod(rhs[d] for d in range(len(rhs)) if d not in set(rhs_c) | set(_rhs_b))
    return 2.0 * batch * lhs_free * rhs_free * contract


def _conv_flops(eqn) -> float:
    out_shape = eqn.outvars[0].aval.shape
    kernel_shape = eqn.invars[1].aval.shape
    dnums = eqn.params["dimension_numbers"]
    kernel_spatial = _prod(kernel_shape[d] for d in dnums.rhs_spec[2:])
    in_features = kernel_shape[dnums.rhs_spec[1]]  # kernel stores per-group input features
    return 2.0 * _prod(out_shape) * in_features * kernel_spatial


def jaxpr_flops(jaxpr) -> float:
    """Total dot/conv FLOPs of a (Closed)Jaxpr, loop bodies multiplied out."""
    closed = getattr(jaxpr, "jaxpr", None)
    if closed is not None and hasattr(jaxpr, "consts"):
        jaxpr = closed

    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * jaxpr_flops(eqn.params["jaxpr"])
        elif name == "while":
            # trip count is not static; count the body once (lower bound) —
            # none of the benched programs use while except XLA-internal loops
            total += jaxpr_flops(eqn.params["body_jaxpr"])
        elif name == "cond":
            total += max(jaxpr_flops(b) for b in eqn.params["branches"])
        else:
            # generic containers: pjit / remat / custom_vjp / closed_call ...
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key)
                if sub is not None:
                    total += jaxpr_flops(sub)
                    break
    return total


def count_flops(fn, *args) -> float:
    """Trace ``fn(*args)`` and return its static MXU FLOP count."""
    return jaxpr_flops(jax.make_jaxpr(fn)(*args))
