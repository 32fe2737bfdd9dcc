"""Levelized witness evaluator vs the sequential reference evaluator.

The leveled program (host and device backends) must reproduce
code_eval_list exactly: same env, and ZeroDivisionError exactly when the
lazy evaluator raises (poison tracking through if/div)."""

import pytest

from zukelang_tpu.core import comp, lang as L
from zukelang_tpu.core.witness import (compile_witness_program, eval_auto,
                                       eval_device, eval_host)
from zukelang_tpu.golden.field import Fr
from zukelang_tpu.rng import Gen
from zukelang_tpu.testing.suites import SUITE


def _compiled_inputs(e, seed=5):
    c = comp.compile_expr(e)
    _i, env_lang, env_code = comp.gen_inputs(c.inputs, Gen(seed))
    gvars = c.circuit.vars()
    env_code = {v: f for v, f in env_code.items() if v in gvars}
    return c, env_code


def _program(c, env_code):
    return compile_witness_program(c.codes, list(env_code.keys()))


@pytest.mark.parametrize("name,mk", SUITE[:8], ids=[n for n, _ in SUITE[:8]])
def test_levelized_matches_sequential(name, mk):
    e = mk()
    for seed in (5, 9):
        c, env_code = _compiled_inputs(e, seed)
        try:
            want = comp.code_eval_list(env_code, c.codes)
        except ZeroDivisionError:
            continue  # random inputs hit a division; covered separately
        prog = _program(c, env_code)
        got = eval_host(prog, env_code)
        assert got == want
        got_dev = eval_device(prog, env_code)
        assert got_dev == want


def test_division_by_zero_poisons():
    # 1/x with x = 0: sequential raises; leveled must too (both backends)
    x = L.input("x", L.SECRET, L.ty_field)
    e = L.let_(x, lambda v: L.div(L.fnum(1), v))
    c = comp.compile_expr(e)
    env = {vs[0]: Fr(0) for name, (_s, _t, vs) in c.inputs.items()
           if name != "$ONE"}
    from zukelang_tpu.core.circuit import ONE
    env[ONE] = Fr(1)
    with pytest.raises(ZeroDivisionError):
        comp.code_eval_list(env, c.codes)
    prog = compile_witness_program(c.codes, list(env.keys()))
    with pytest.raises(ZeroDivisionError):
        eval_host(prog, env)
    with pytest.raises(ZeroDivisionError):
        eval_device(prog, env)


def test_untaken_division_not_poisoned():
    # or(a, b) with a = b = false: the witness Code divides by (a+b) == 0
    # inside the UNTAKEN branch of an if (comp.py Or gadget); the lazy
    # evaluator doesn't raise, so neither may the leveled one.
    a = L.input("a", L.SECRET, L.ty_bool)
    b = L.input("b", L.SECRET, L.ty_bool)
    e = L.let_(a, lambda av: L.let_(b, lambda bv: L.or_(av, bv)))
    c = comp.compile_expr(e)
    from zukelang_tpu.core.circuit import ONE
    env = {}
    for name, (_s, _t, vs) in c.inputs.items():
        if name == "$ONE":
            continue
        env[vs[0]] = Fr(0)
    env[ONE] = Fr(1)
    want = comp.code_eval_list(env, c.codes)
    prog = compile_witness_program(c.codes, list(env.keys()))
    assert eval_host(prog, env) == want
    assert eval_device(prog, env) == want


def test_eval_auto_fallback_for_deep_chains():
    # a long multiplicative chain is depth == steps: eval_auto must pick
    # the host path (and still agree).  NB: the chain must share subtrees
    # through let_ — expressions are trees, and mul(acc, acc) on a raw
    # Expr recompiles acc per occurrence (exponential), matching the
    # reference's semantics.
    x = L.input("x", L.SECRET, L.ty_field)

    def build(v, d):
        if d == 0:
            return v
        return L.let_(L.mul(v, v), lambda w: build(w, d - 1))

    e = L.let_(x, lambda v: build(v, 40))
    c, env_code = _compiled_inputs(e)
    want = comp.code_eval_list(env_code, c.codes)
    prog = _program(c, env_code)
    assert len(prog.levels) >= 40
    assert eval_auto(prog, env_code) == want
