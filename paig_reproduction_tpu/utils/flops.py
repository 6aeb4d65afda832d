"""MXU FLOP counting by jaxpr walk.

Sums only ``dot_general`` / ``conv_general_dilated`` FLOPs (2*M*N*K per
contraction), recursing through scan (x length), cond (max branch), pjit
and custom-vjp calls — the matrix-unit FLOPs an MFU claim can honestly
count, independent of XLA's cost analysis. Shared by bench.py and
tools/mfu_audit.py.
"""
from __future__ import annotations

import numpy as np


def _dot_general_flops(eqn) -> float:
    ((lc, rc), (lb, rb)) = eqn.params["dimension_numbers"]
    a, b = (v.aval.shape for v in eqn.invars[:2])
    batch = float(np.prod([a[i] for i in lb], dtype=np.float64)) if lb else 1.0
    k = float(np.prod([a[i] for i in lc], dtype=np.float64)) if lc else 1.0
    m = float(np.prod([d for i, d in enumerate(a)
                       if i not in lc and i not in lb], dtype=np.float64))
    n = float(np.prod([d for i, d in enumerate(b)
                       if i not in rc and i not in rb], dtype=np.float64))
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    dn = eqn.params["dimension_numbers"]
    # rhs layout per dn.rhs_spec: (out_ch, in_ch/g, *spatial) — the
    # in-channel extent is ALREADY per-group, so each output element costs
    # 2 * in_ch_per_g * prod(spatial) regardless of the group count.
    rhs_spec = dn.rhs_spec
    in_ch_per_g = rhs[rhs_spec[1]]
    spatial = [rhs[i] for i in rhs_spec[2:]]
    out_elems = float(np.prod(out, dtype=np.float64))
    return (2.0 * out_elems * in_ch_per_g
            * float(np.prod(spatial, dtype=np.float64)))


def matmul_flops(jaxpr) -> float:
    """Sum dot/conv FLOPs over a (Closed)Jaxpr, recursing through control
    flow: scan multiplies its body by length, cond takes the max branch."""
    inner = getattr(jaxpr, "jaxpr", jaxpr)
    total = 0.0
    for eqn in inner.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * matmul_flops(eqn.params["jaxpr"])
        elif name == "cond":
            total += max((matmul_flops(b)
                          for b in eqn.params["branches"]), default=0.0)
        elif name == "while":
            # bounded rollouts in this codebase are scans; a while here
            # would be un-countable — flag loudly rather than undercount.
            raise RuntimeError("while_loop in audited graph")
        else:
            for p in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                if p in eqn.params:
                    total += matmul_flops(eqn.params[p])
                    break
    return total
