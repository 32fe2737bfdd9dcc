"""Python front-end tests: the 11 syntax-front-end programs of the
reference suite (test.ml:290-316), written in Python syntax, cross-checked
Lang-vs-Code and proven end-to-end on a sample."""

import pytest

from zukelang_tpu.core import lang as L
from zukelang_tpu.frontend import compile_python
from zukelang_tpu.golden.field import Fr
from zukelang_tpu.protocols.groth16 import Groth16

from test_lang_comp import crosscheck


def src(s):
    return "def prog():\n" + "\n".join("    " + l for l in s.strip().split("\n"))


PROGRAMS = {
    # trans_test programs, test.ml:292-316
    "cubic": """
x: int = secret("input")
return x * x * x + x + 3
""",
    "if": """
x: int = secret("input")
return 1 if x == 0 else 2
""",
    "square": """
x: int = secret("input")
return x * x
""",
    "pair_out": """
x: int = secret("input")
return (x + 1, x * x)
""",
    "nested_pair": """
x: int = secret("input")
y = ((x + 1, x * x), x * x * x)
return y[0][1]
""",
    "bool_pair_eq": """
x: bool = secret("input")
y: bool = secret("input2")
return (x, y) == (y, x)
""",
    "either": """
x: bool = secret("input")
return Left(x) if x else Right(x)
""",
    "match": """
x: Either[(int, int), bool] = secret("input")
match x:
    case Left(a):
        return a[0] * a[1]
    case Right(_b):
        return 1
""",
    "no_let": """
return secret("input") + 1
""",
    "pair_out2": """
x: int = secret("input")
return (x + 1, x + 2)
""",
    "pair_in": """
x: (int, int) = secret("input")
return x[0] + x[1]
""",
}


def test_no_let_requires_annotation_free_field_default():
    # `secret("input") + 1`: the + context forces field; annotation-free
    # works because addition is field-typed.
    e = compile_python(src(PROGRAMS["no_let"]))
    assert e.ty == L.ty_field


@pytest.mark.parametrize("name", [k for k in PROGRAMS if k != "no_let"])
def test_frontend_crosscheck(name):
    e = compile_python(src(PROGRAMS[name]))
    for seed in range(2):
        crosscheck(e, seed=seed)


def test_frontend_cubic_equals_combinator():
    e = compile_python(src(PROGRAMS["cubic"]))
    # structurally a let of input with the cubic body
    assert e.tag == "let"
    assert e.ty == L.ty_field


def test_uint32_program():
    e = compile_python(src("""
x: u32 = secret("input")
y: u32 = secret("input2")
return x - y
"""))
    assert e.ty == L.ty_uint32
    crosscheck(e, seed=1)


@pytest.mark.slow
def test_frontend_end_to_end_proof():
    from zukelang_tpu.testing.harness import random_test
    e = compile_python(src(PROGRAMS["match"]))
    assert random_test(e, Groth16(), seed=3).verified
