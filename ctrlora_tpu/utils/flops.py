"""Analytic FLOP counting by walking a jaxpr.

XLA's compiled cost_analysis() counts called computations (scan/while
bodies) once, so a 50-step DDIM scan under-reports ~50x. This walker
multiplies scan bodies by their trip count and counts the two FLOP-dominant
primitive families (dot_general, conv_general_dilated) with the MAC=2
convention. Elementwise FLOPs are ignored — they are <1% of an SD-scale
graph and bandwidth-bound anyway.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np
from jax import core as jcore


def _dot_flops(eqn) -> float:
    a, b = eqn.invars[0].aval, eqn.invars[1].aval
    dims = eqn.params["dimension_numbers"]
    (lc, rc), (lb, rb) = dims
    batch = math.prod(a.shape[i] for i in lb) if lb else 1
    contract = math.prod(a.shape[i] for i in lc) if lc else 1
    m = math.prod(
        a.shape[i] for i in range(len(a.shape)) if i not in set(lc) | set(lb)
    )
    n = math.prod(
        b.shape[i] for i in range(len(b.shape)) if i not in set(rc) | set(rb)
    )
    return 2.0 * batch * m * n * contract


def _conv_flops(eqn) -> float:
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    fgc = eqn.params.get("feature_group_count", 1)
    bgc = eqn.params.get("batch_group_count", 1)
    # output spatial x batch x out-ch, times kernel spatial x in-ch/group
    out_elems = math.prod(out.shape)
    k_spatial = math.prod(rhs.shape[i] for i in dn.rhs_spec[2:])
    cin = lhs.shape[dn.lhs_spec[1]] // fgc
    return 2.0 * out_elems * k_spatial * cin / max(bgc, 1)


def jaxpr_flops(jaxpr: Any) -> float:
    """Total dot/conv FLOPs of a (Closed)Jaxpr, scan-aware."""
    if hasattr(jaxpr, "jaxpr"):
        jaxpr = jaxpr.jaxpr
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * jaxpr_flops(eqn.params["jaxpr"])
        elif name == "while":
            # trip count unknown statically; count the body once
            total += jaxpr_flops(eqn.params["body_jaxpr"])
        elif name == "cond":
            branches = eqn.params["branches"]
            total += max(jaxpr_flops(b) for b in branches)
        elif name == "pallas_call":
            # kernel jaxprs are per-block; callers count the XLA-equivalent
            # trace instead (see fn_flops docstring)
            pass
        elif name == "custom_vjp_call" and "call_jaxpr" in eqn.params:
            total += jaxpr_flops(eqn.params["call_jaxpr"])
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key) if eqn.params else None
                if sub is not None:
                    total += jaxpr_flops(sub)
                    break
    return total


def fn_flops(fn, *args, **kwargs) -> float:
    """FLOPs of one call of `fn(*args)` (traced, not executed).

    Pallas kernels trace as opaque custom calls; trace under
    kernel_flags.override(use_flash=False) if kernel FLOPs must be
    included — flash attention FLOPs equal the XLA-attention FLOPs it
    replaces, so counting the XLA variant is exact.
    """
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return jaxpr_flops(closed)
