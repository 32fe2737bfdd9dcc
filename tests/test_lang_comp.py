"""Compiler correctness without crypto: Lang interpreter vs compiled Code.

Mirrors `Comp.test` (src/lib/zk/comp.ml:569-614) and extends it across the
whole suite and targeted edge cases (the reference's Div/Case latent bugs).
"""

import pytest

from zukelang_tpu.core import comp, lang as L
from zukelang_tpu.golden.field import Fr
from zukelang_tpu.rng import Gen
from zukelang_tpu.testing.suites import SUITE


def crosscheck(e, seed=0, inputs_values=None, retries=50):
    c = comp.compile_expr(e)
    rng = Gen(seed)
    for _ in range(retries):
        if inputs_values is None:
            _i, env_lang, env_code = comp.gen_inputs(c.inputs, rng)
        else:
            env_lang = inputs_values
            _i, env_code = comp.convert_inputs(c.inputs, inputs_values)
        gvars = c.circuit.vars()
        env_code = {v: f for v, f in env_code.items() if v in gvars}
        try:
            o = L.eval_expr(env_lang, e)
            sol = comp.code_eval_list(env_code, c.codes)
        except ZeroDivisionError:
            if inputs_values is not None:
                raise
            continue
        fs_o = L.compile_value(e.ty, o)
        fs_sol = [a.eval(sol, Fr) for a in c.result]
        assert fs_o == fs_sol, f"lang={fs_o} code={fs_sol} for {e!r}"
        return c, o, sol
    raise RuntimeError("kept dividing by zero")


@pytest.mark.parametrize("name,mk", SUITE, ids=[n for n, _ in SUITE])
def test_suite_crosscheck(name, mk):
    for seed in range(3):
        crosscheck(mk(), seed=seed)


def test_comp_test_programs():
    # the two programs of comp.ml:617-629
    crosscheck(L.let_(L.input("input", L.SECRET, L.ty_field),
                      lambda x: L.if_(L.eq(x, L.fnum(0)), L.fnum(1), L.fnum(2))))
    crosscheck(L.let_(L.input("input", L.SECRET, L.ty_field),
                      lambda x: L.pair(L.add(x, L.fnum(1)), L.mul(x, L.fnum(2)))))


def test_div_gadget():
    e = L.let_(L.input("a", L.SECRET, L.ty_field),
               lambda a: L.let_(L.input("b", L.SECRET, L.ty_field),
                                lambda b: L.div(a, b)))
    c, o, sol = crosscheck(e, seed=3)
    # two gates: 1 = b*c and d = a*c
    assert len(c.gates) >= 2


def test_div_const_folding_is_correct():
    # The reference folds const/const division to a*b (comp.ml:249, a latent
    # bug); we fold to a/b.  The compiled result must equal the interpreter.
    # (A pure-constant output is not a valid circuit — comp.ml:511-513 —
    # so fold inside a program with an input.)
    e = L.let_(L.input("x", L.SECRET, L.ty_field),
               lambda x: L.mul(x, L.div(L.fnum(10), L.fnum(4))))
    c, o, sol = crosscheck(e, inputs_values={"x": L.v_field(Fr(2))})
    assert o == L.v_field(Fr(2) * (Fr(10) / Fr(4)))


def test_div_by_const():
    e = L.let_(L.input("a", L.SECRET, L.ty_field),
               lambda a: L.div(a, L.fnum(7)))
    crosscheck(e)


def test_case_left_arm_value():
    # The reference's Case join emits (tag-1)*c + tag*d which negates Left
    # results (comp.ml:433); our (1-tag)*c + tag*d must match the evaluator
    # even when the Left arm returns 1 (true).
    e = L.let_(L.input("input", L.SECRET, L.ty_either(L.ty_field, L.ty_bool)),
               lambda x: L.case(x, lambda i: L.eq(i, i), lambda b: b))
    crosscheck(e, inputs_values={"input": L.v_left(L.v_field(Fr(5)))})


def test_uint32_semantics():
    e = L.let_(L.input("input", L.SECRET, L.ty_uint32),
               lambda x: L.add_u32(x, x))
    v = (1 << 31) + 5  # wraps
    c, o, sol = crosscheck(e, inputs_values={"input": L.v_uint32(v)})
    assert o == L.v_uint32((2 * v) % (1 << 32))


def test_not_and_or():
    e = L.let_(L.input("a", L.SECRET, L.ty_bool),
               lambda a: L.let_(L.input("b", L.SECRET, L.ty_bool),
                                lambda b: L.or_(L.not_(a), L.and_(a, b))))
    for seed in range(5):
        crosscheck(e, seed=seed)


def test_outputs_are_normalized_vars():
    for name, mk in SUITE:
        c = comp.compile_expr(mk())
        for a in c.result:
            items = list(a.m.items())
            assert len(items) <= 1


def test_no_one_circuit_has_no_public_inputs():
    # test.ml:204-213: x*x must not pull $ONE into the circuit
    from zukelang_tpu.core.circuit import ONE
    c = comp.compile_expr(L.let_(L.input("input", L.SECRET, L.ty_field),
                                 lambda x: L.mul(x, x)))
    assert ONE not in c.circuit.vars()
    assert not c.circuit.inputs_public


def test_check_u32_valid_witness():
    """check_u32 gadget: valid uint32 inputs compile, witness, and satisfy
    every gate; the checked wire equals the product-chain reconstruction."""
    from zukelang_tpu.core import comp as comp_mod
    from zukelang_tpu.core import lang as L
    from zukelang_tpu.golden.field import Fr

    e = L.let_(L.check_u32(L.input("x", L.SECRET, L.ty_uint32)),
               lambda x: L.add_u32(x, L.uint32(41)))
    res = comp_mod.compile_expr(e)
    for xval in (0, 1, 5, (1 << 32) - 1, 123456789):
        _, env = comp_mod.convert_inputs(res.inputs, {"x": L.v_uint32(xval)})
        w = comp_mod.code_eval_list(env, res.codes)
        for g in res.circuit.gates:
            assert g.lhs.eval(w, Fr) == g.l.eval(w, Fr) * g.r.eval(w, Fr), \
                (xval, g)


def test_check_u32_rejects_non_torsion_value():
    """No satisfying assignment exists when the checked wire is not a
    uint32 embedding: witness generation fails, and any boolean bit
    assignment violates the reconstruction gate."""
    import pytest as _pytest

    from zukelang_tpu.core import comp as comp_mod
    from zukelang_tpu.core import lang as L
    from zukelang_tpu.core.circuit import ONE
    from zukelang_tpu.golden.field import Fr

    e = L.check_u32(L.input("x", L.SECRET, L.ty_uint32))
    res = comp_mod.compile_expr(e)
    xvar = res.inputs["x"][2][0]
    # witness generation refuses: Fr(5) is (whp) not in the 2^32 torsion
    env = {ONE: Fr(1), xvar: Fr(5)}
    with _pytest.raises(AssertionError):
        comp_mod.code_eval_list(env, res.codes)
    # manual all-zero-bits assignment violates the final gate
    w = dict(env)
    for v, c in res.codes:
        try:
            w[v] = comp_mod.code_eval(w, c)
        except AssertionError:
            w[v] = Fr(0)
    bad = [g for g in res.circuit.gates
           if g.lhs.eval(w, Fr) != g.l.eval(w, Fr) * g.r.eval(w, Fr)]
    assert bad, "tampered witness must violate at least one gate"
