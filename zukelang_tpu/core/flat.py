"""Flattening circuits/QAPs into static-shape arrays for the TPU engine.

The reference works with Var.Maps of polynomials (QAP.ml:11-16); the TPU
path never materializes per-variable polynomials.  Instead the circuit is
flattened once into:

  * a variable index (sorted Vars -> columns),
  * per-gate padded coefficient rows for l / r / lhs (dense (G, K) with K =
    max terms per affine) — the "forward" matvec that evaluates
    sum_k sol_k * coeff(k, g) per gate, and
  * var-sorted nnz triplets — the "transpose" matvec that evaluates
    A_k(tau) = sum_g coeff(k, g) * L_g(tau) per variable (keygen side).

All entries are Montgomery-form packed limbs, ready for the jitted
pipelines in engine.jax_engine.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from .. import params
from ..ops import field_jax as F
from .circuit import Gate
from .var import Var


@dataclass
class FlatSide:
    """One of l / r / lhs as padded dense rows + var-sorted triplets."""
    idx: np.ndarray        # (G, K) int32 var column (or V for padding)
    coef: np.ndarray       # (nl, G, K) uint32 Montgomery coefficients
    # transpose view (sorted by var column):
    t_var: np.ndarray      # (M,) int32 var column per nnz, ascending
    t_gate: np.ndarray     # (M,) int32 gate row per nnz
    t_coef: np.ndarray     # (nl, M) uint32 Montgomery coefficients


@dataclass
class FlatCircuit:
    vars_sorted: List[Var]
    var_index: Dict[Var, int]
    n_gates: int
    logn: int              # NTT domain size = 2^logn >= n_gates
    l: FlatSide
    r: FlatSide
    lhs: FlatSide

    @property
    def domain_size(self):
        return 1 << self.logn

    def pack_witness(self, sol: Dict[Var, object]) -> "np.ndarray":
        """Witness dict -> Montgomery (nl, V+1) with a trailing zero column
        (the padding target of dense rows)."""
        vals = [sol[v].n for v in self.vars_sorted] + [0]
        return F.pack_mont(vals, F.FR)


def _flatten_side(gates: List[Gate], pick, var_index, n_pad_col: int) -> FlatSide:
    rows = []
    for g in gates:
        aff = pick(g)
        rows.append([(var_index[v], c.n) for v, c in sorted(aff.m.items(),
                                                           key=lambda kv: kv[0])])
    K = max((len(r) for r in rows), default=1)
    K = max(K, 1)
    G = len(rows)
    idx = np.full((G, K), n_pad_col, dtype=np.int32)
    coefs = [[0] * K for _ in range(G)]
    triplets = []
    for gi, row in enumerate(rows):
        for j, (vi, cn) in enumerate(row):
            idx[gi, j] = vi
            coefs[gi][j] = cn
            triplets.append((vi, gi, cn))
    flat_coefs = [c for row in coefs for c in row]
    coef = np.asarray(F.pack_mont(flat_coefs, F.FR)).reshape(
        params.FR_LIMBS, G, K)

    triplets.sort(key=lambda t: (t[0], t[1]))
    if triplets:
        t_var = np.array([t[0] for t in triplets], dtype=np.int32)
        t_gate = np.array([t[1] for t in triplets], dtype=np.int32)
        t_coef = np.asarray(F.pack_mont([t[2] for t in triplets], F.FR))
    else:
        t_var = np.zeros(1, dtype=np.int32)
        t_gate = np.zeros(1, dtype=np.int32)
        t_coef = np.asarray(F.pack_mont([0], F.FR))
    return FlatSide(idx=idx, coef=coef, t_var=t_var, t_gate=t_gate,
                    t_coef=t_coef)


def flatten(gates: List[Gate]) -> FlatCircuit:
    from .circuit import gates_vars, sort_gates
    gates = sort_gates(gates)
    vars_sorted = sorted(gates_vars(gates))
    var_index = {v: i for i, v in enumerate(vars_sorted)}
    n_gates = len(gates)
    logn = max(1, (max(n_gates, 2) - 1).bit_length())
    V = len(vars_sorted)
    return FlatCircuit(
        vars_sorted=vars_sorted,
        var_index=var_index,
        n_gates=n_gates,
        logn=logn,
        l=_flatten_side(gates, lambda g: g.l, var_index, V),
        r=_flatten_side(gates, lambda g: g.r, var_index, V),
        lhs=_flatten_side(gates, lambda g: g.lhs, var_index, V),
    )
