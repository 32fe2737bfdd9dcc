"""Levelized batched witness generation.

The reference generates witnesses by evaluating straight-line `Code`
sequentially (comp.ml:114-122); core.comp.code_eval_list mirrors that.
For wide circuits that is a long chain of Python big-int operations.  This
module compiles the Code list ONCE into a level-scheduled array program:

  * every Code subtree becomes a primitive step (affine / mul / div / not /
    or / eq / if) writing one slot of a value table,
  * steps are scheduled by dependency level; within a level, steps of the
    same kind evaluate as ONE batched field operation (device Montgomery
    limb kernels via ops.field_jax),
  * the reference's *lazy* semantics survive eager evaluation through
    poison tracking: `div` marks its output poisoned when the denominator
    is zero, `if` propagates only the taken branch's poison, and a
    poisoned assigned wire reproduces code_eval_list's ZeroDivisionError
    (the harness' resample-and-retry contract, test.ml:148-150).

Wall-clock wins require wide levels (the critical path is inherently
sequential); eval_auto falls back to the host path for deep narrow
programs.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..golden.field import Fr
from .circuit import ONE
from .comp import Code
from .var import Var


@dataclass
class _Step:
    kind: str                      # affine|mul|div|not|or|eq|if
    out: int                       # output slot
    args: Tuple[int, ...] = ()     # operand slots (unary/binary/ternary)
    terms: Tuple[Tuple[int, int], ...] = ()   # affine: (slot, coef) pairs
    level: int = 0


@dataclass
class WitnessProgram:
    n_slots: int
    input_slots: Dict[Var, int]         # circuit inputs (incl. ONE) -> slot
    var_slot: Dict[Var, int]            # every witness var -> slot
    code_vars: List[Var]                # vars assigned by Code (poison-checked)
    levels: List[List[_Step]]           # steps grouped by level, level order
    n_steps: int = 0
    _device_plan: object = None         # lazily built by the device evaluator


def compile_witness_program(codes: Sequence[Tuple[Var, Code]],
                            input_vars: Sequence[Var]) -> WitnessProgram:
    """Flatten nested Code trees into leveled primitive steps."""
    slot_of: Dict[Var, int] = {}
    slot_level: Dict[int, int] = {}
    steps: List[_Step] = []
    n = 0

    def new_slot(level: int) -> int:
        nonlocal n
        s = n
        n += 1
        slot_level[s] = level
        return s

    for v in input_vars:
        if v not in slot_of:
            slot_of[v] = new_slot(0)
    if ONE not in slot_of:
        slot_of[ONE] = new_slot(0)

    def emit_affine(aff) -> Tuple[int, int]:
        """-> (slot, level) for an affine combination of known vars."""
        terms = []
        lvl = 0
        for var, coef in sorted(aff.m.items()):
            s = slot_of[var]
            terms.append((s, coef.n))
            lvl = max(lvl, slot_level[s])
        if len(terms) == 1 and terms[0][1] == 1:
            return terms[0][0], lvl           # bare var: alias, no step
        if not terms:                         # zero affine: 0 * ONE
            terms = [(slot_of[ONE], 0)]
        lvl += 1
        out = new_slot(lvl)
        steps.append(_Step("affine", out, terms=tuple(terms), level=lvl))
        return out, lvl

    def emit(c: Code) -> Tuple[int, int]:
        t, a = c.tag, c.args
        if t == "affine":
            return emit_affine(a[0])
        subs = [emit(x) for x in a]
        lvl = 1 + max(l for _, l in subs)
        out = new_slot(lvl)
        steps.append(_Step(t, out, args=tuple(s for s, _ in subs), level=lvl))
        return out, lvl

    code_vars = []
    for v, c in codes:
        s, _ = emit(c)
        if v in slot_of:
            raise AssertionError(f"duplicate witness assignment {v}")
        slot_of[v] = s
        code_vars.append(v)

    max_level = max((st.level for st in steps), default=0)
    levels: List[List[_Step]] = [[] for _ in range(max_level + 1)]
    for st in steps:
        levels[st.level].append(st)
    levels = [lv for lv in levels if lv]

    return WitnessProgram(
        n_slots=n,
        input_slots={v: slot_of[v]
                     for v in list(dict.fromkeys(input_vars)) + [ONE]},
        var_slot=dict(slot_of),
        code_vars=code_vars,
        levels=levels,
        n_steps=len(steps),
    )


def _bind_inputs(prog: WitnessProgram, env: Dict[Var, Fr]) -> Dict[int, Fr]:
    init = {}
    for v, s in prog.input_slots.items():
        if v in env:
            init[s] = env[v]
        elif v == ONE:
            init[s] = Fr(1)
        else:
            raise KeyError(f"witness input not bound: {v}")
    return init


def _finish(prog: WitnessProgram, env: Dict[Var, Fr],
            value_of, poisoned) -> Dict[Var, Fr]:
    """Assemble the result env (mirrors code_eval_list: inputs as given plus
    one binding per Code assignment), raising on a poisoned assignment."""
    out = dict(env)
    for v in prog.code_vars:
        s = prog.var_slot[v]
        if poisoned(s):
            raise ZeroDivisionError("witness division by zero")
        out[v] = value_of(s)
    return out


# ---------------------------------------------------------------------------
# Host evaluator — the oracle and the deep-narrow fallback
# ---------------------------------------------------------------------------

def eval_host(prog: WitnessProgram, env: Dict[Var, Fr]) -> Dict[Var, Fr]:
    vals: List[Optional[Fr]] = [None] * prog.n_slots
    poison = [False] * prog.n_slots
    for s, f in _bind_inputs(prog, env).items():
        vals[s] = f
    one, zero = Fr(1), Fr(0)
    for level in prog.levels:
        for st in level:
            if st.kind == "affine":
                acc, p = zero, False
                for s, coef in st.terms:
                    acc = acc + vals[s] * Fr(coef)
                    p = p or poison[s]
            elif st.kind == "mul":
                a, b = st.args
                acc, p = vals[a] * vals[b], poison[a] or poison[b]
            elif st.kind == "div":
                a, b = st.args
                if vals[b].is_zero():
                    acc, p = zero, True
                else:
                    acc, p = vals[a] / vals[b], poison[a] or poison[b]
            elif st.kind == "not":
                (a,) = st.args
                acc, p = (one if vals[a].is_zero() else zero), poison[a]
            elif st.kind == "or":
                a, b = st.args
                acc = zero if (vals[a].is_zero() and vals[b].is_zero()) else one
                p = poison[a] or poison[b]
            elif st.kind == "eq":
                a, b = st.args
                acc = one if vals[a] == vals[b] else zero
                p = poison[a] or poison[b]
            elif st.kind == "if":
                c, x, y = st.args
                taken = y if vals[c].is_zero() else x
                acc, p = vals[taken], poison[c] or poison[taken]
            else:
                raise ValueError(st.kind)
            vals[st.out], poison[st.out] = acc, p
    return _finish(prog, env, lambda s: vals[s], lambda s: poison[s])


# ---------------------------------------------------------------------------
# Device evaluator: per-level batched Montgomery limb kernels
# ---------------------------------------------------------------------------

MAX_DEVICE_LEVELS = 512     # deeper -> per-level dispatch dominates
MIN_AVG_WIDTH = 4.0         # narrower -> no batching to win


def eval_auto(prog: WitnessProgram, env: Dict[Var, Fr]) -> Dict[Var, Fr]:
    width = prog.n_steps / max(1, len(prog.levels))
    if len(prog.levels) > MAX_DEVICE_LEVELS or width < MIN_AVG_WIDTH:
        return eval_host(prog, env)
    return eval_device(prog, env)


@dataclass
class _LevelOps:
    """Static gather/scatter indices for one level, one op kind.  Batches
    are padded to powers of two (scratch output slot, slot-0 operands) so
    jitted kernels recompile only per (kind, pow2 width, K)."""
    kind: str
    outs: np.ndarray               # (W,) output slots
    srcs: np.ndarray               # (W, A) operand slots (affine: (W, K))
    coefs: Optional[np.ndarray]    # affine only: (nl, W, K) Montgomery


def _pad_w(n: int) -> int:
    return 1 << max(3, (n - 1).bit_length())


def _plan(prog: WitnessProgram) -> List[List[_LevelOps]]:
    from ..ops import field_jax as F
    if prog._device_plan is not None:
        return prog._device_plan
    scratch = prog.n_slots  # extra slot appended by eval_device
    plan = []
    for level in prog.levels:
        by_kind: Dict[str, List[_Step]] = {}
        for st in level:
            by_kind.setdefault(st.kind, []).append(st)
        ops = []
        for kind, sts in sorted(by_kind.items()):
            W = _pad_w(len(sts))
            outs = np.full(W, scratch, dtype=np.int32)
            outs[:len(sts)] = [st.out for st in sts]
            if kind == "affine":
                K = max(len(st.terms) for st in sts)
                srcs = np.zeros((W, K), dtype=np.int32)
                cints = [0] * (W * K)
                for i, st in enumerate(sts):
                    for k, (s, cn) in enumerate(st.terms):
                        srcs[i, k] = s
                        cints[i * K + k] = cn
                coefs = np.asarray(F.pack_mont(cints, F.FR)).reshape(
                    F.FR.nl, W, K)
                ops.append(_LevelOps("affine", outs, srcs, coefs))
            else:
                A = len(sts[0].args)
                srcs = np.zeros((W, A), dtype=np.int32)
                srcs[:len(sts)] = [st.args for st in sts]
                ops.append(_LevelOps(kind, outs, srcs, None))
        plan.append(ops)
    prog._device_plan = plan
    return plan


@functools.lru_cache(maxsize=32)
def _kernels(K: int):
    """Jitted per-kind level kernels, specialized on affine term count."""
    import jax
    import jax.numpy as jnp

    from ..ops import field_jax as F
    FR = F.FR

    def ones(n):
        return F.ones_mont(n, FR)

    def zeros(n):
        return jnp.zeros((FR.nl, n), jnp.uint32)

    @jax.jit
    def k_affine(vals, pois, srcs, coefs):
        acc = None
        pacc = None
        for k in range(K):
            t = F.mont_mul(vals[:, srcs[:, k]], coefs[:, :, k], FR)
            p = pois[srcs[:, k]]
            acc = t if acc is None else F.add(acc, t, FR)
            pacc = p if pacc is None else (pacc | p)
        return acc, pacc

    @jax.jit
    def k_mul(vals, pois, srcs):
        a, b = srcs[:, 0], srcs[:, 1]
        return (F.mont_mul(vals[:, a], vals[:, b], FR), pois[a] | pois[b])

    @jax.jit
    def k_div(vals, pois, srcs):
        a, b = srcs[:, 0], srcs[:, 1]
        bb = vals[:, b]
        den0 = F.is_zero(bb)
        # Fermat inverse composed from mont_mul is exact on Montgomery
        # forms: pow_mont(x*R, p-2) = x^{-1}*R.  Zero stays zero.
        q = F.mont_mul(vals[:, a], F.inv(bb, FR), FR)
        return q, (pois[a] | pois[b] | den0)

    @jax.jit
    def k_not(vals, pois, srcs):
        a = srcs[:, 0]
        az = F.is_zero(vals[:, a])
        n = a.shape[0]
        return F.select(az, ones(n), zeros(n)), pois[a]

    @jax.jit
    def k_or(vals, pois, srcs):
        a, b = srcs[:, 0], srcs[:, 1]
        both0 = F.is_zero(vals[:, a]) & F.is_zero(vals[:, b])
        n = a.shape[0]
        return F.select(both0, zeros(n), ones(n)), pois[a] | pois[b]

    @jax.jit
    def k_eq(vals, pois, srcs):
        a, b = srcs[:, 0], srcs[:, 1]
        e = F.eq(vals[:, a], vals[:, b])
        n = a.shape[0]
        return F.select(e, ones(n), zeros(n)), pois[a] | pois[b]

    @jax.jit
    def k_if(vals, pois, srcs):
        c, x, y = srcs[:, 0], srcs[:, 1], srcs[:, 2]
        cz = F.is_zero(vals[:, c])
        v = F.select(cz, vals[:, y], vals[:, x])
        p = pois[c] | (cz & pois[y]) | (~cz & pois[x])
        return v, p

    return {"affine": k_affine, "mul": k_mul, "div": k_div, "not": k_not,
            "or": k_or, "eq": k_eq, "if": k_if}


def eval_device(prog: WitnessProgram, env: Dict[Var, Fr]) -> Dict[Var, Fr]:
    import jax.numpy as jnp

    from ..ops import field_jax as F
    FR = F.FR

    init = _bind_inputs(prog, env)
    # one trailing scratch slot absorbs padded-batch outputs (_plan)
    vals = np.zeros((FR.nl, prog.n_slots + 1), dtype=np.uint32)
    slots = sorted(init)
    packed = np.asarray(F.pack_mont([init[s].n for s in slots], FR))
    vals[:, slots] = packed
    dvals = jnp.asarray(vals)
    dpois = jnp.zeros(prog.n_slots + 1, dtype=bool)

    for ops in _plan(prog):
        for op in ops:
            if op.kind == "affine":
                kern = _kernels(op.srcs.shape[1])["affine"]
                res, p = kern(dvals, dpois, jnp.asarray(op.srcs),
                              jnp.asarray(op.coefs))
            else:
                kern = _kernels(0)[op.kind]
                res, p = kern(dvals, dpois, jnp.asarray(op.srcs))
            dvals = dvals.at[:, op.outs].set(res)
            dpois = dpois.at[op.outs].set(p)

    host = F.unpack_mont(dvals, FR)
    pois = np.asarray(dpois)
    return _finish(prog, env, lambda s: Fr(host[s]), lambda s: bool(pois[s]))
