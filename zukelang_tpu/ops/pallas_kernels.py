"""Pallas TPU kernels for the hot field ops.

The XLA path (ops/field_jax.py) expresses one Montgomery multiply as ~10
separate HLOs (convs + carry fixes), each round-tripping (nl, N) uint32
arrays through HBM.  This kernel fuses the whole deferred-carry CIOS into
one VMEM-resident pass: the batch is tiled along the lane axis, limb loops
unroll inside the kernel, and each tile reads a/b once and writes the
result once (~3x less HBM traffic at large N).

Functionally identical to field_jax.mont_mul (differentially tested);
selected via field_jax-compatible wrappers below.  Runs under
interpret=True on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import params
from . import field_jax as F

MASK16 = 0xFFFF


def _mont_mul_kernel(a_ref, b_ref, o_ref, *, nl, p_limbs, nprime):
    mask = jnp.uint32(MASK16)
    npr = jnp.uint32(nprime)
    pl_const = [jnp.uint32(int(x)) for x in p_limbs]

    b = [b_ref[j, :] for j in range(nl)]
    zero = jnp.zeros_like(b[0])
    t = [zero] * (nl + 1)

    # deferred-carry CIOS: accumulators stay < 2^24 (4 split halves per
    # iteration, <= nl+1 iterations of lifetime per slot)
    for i in range(nl):
        ai = a_ref[i, :]
        for j in range(nl):
            prod = ai * b[j]
            t[j] = t[j] + (prod & mask)
            t[j + 1] = t[j + 1] + (prod >> 16)
        m = ((t[0] & mask) * npr) & mask
        for j in range(nl):
            prod = m * pl_const[j]
            t[j] = t[j] + (prod & mask)
            t[j + 1] = t[j + 1] + (prod >> 16)
        carry0 = t[0] >> 16  # low 16 bits of t[0] are now exactly zero
        t = t[1:] + [zero]
        t[0] = t[0] + carry0

    # exact ripple carry (values < 2^24, so each step's carry < 2^9)
    limbs = []
    c = zero
    for j in range(nl + 1):
        v = t[j] + c
        limbs.append(v & mask)
        c = v >> 16
    # conditional subtract p (result < 2p)
    pl_ext = pl_const + [jnp.uint32(0)]
    borrow = zero
    diff = []
    for j in range(nl + 1):
        d = limbs[j] - pl_ext[j] - borrow
        borrow = (d >> 31) & jnp.uint32(1)
        diff.append(d & mask)
    ge = borrow == 0  # limbs >= p
    for j in range(nl):
        o_ref[j, :] = jnp.where(ge, diff[j], limbs[j])


@functools.lru_cache(maxsize=8)
def _mont_mul_call(nl: int, n: int, block: int, interpret: bool):
    spec = F.FR if nl == params.FR_LIMBS else F.FQ
    kernel = functools.partial(
        _mont_mul_kernel, nl=nl, p_limbs=tuple(int(x) for x in spec.p_limbs),
        nprime=spec.nprime)
    grid = (n // block,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nl, n), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nl, block), lambda i: (0, i),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((nl, block), lambda i: (0, i),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nl, block), lambda i: (0, i),
                               memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )


def mont_mul_pallas(a: jnp.ndarray, b: jnp.ndarray, spec: F.FieldSpec,
                    block: int = 512, interpret: bool = None) -> jnp.ndarray:
    """Drop-in fused replacement for field_jax.mont_mul.

    Pads the batch up to a block multiple; `interpret` defaults to True off
    TPU so tests exercise the same kernel logic on CPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nl, n = a.shape
    block = min(block, max(128, 1 << (n - 1).bit_length()))
    npad = -(-n // block) * block
    if npad != n:
        a = jnp.pad(a, ((0, 0), (0, npad - n)))
        b = jnp.pad(b, ((0, 0), (0, npad - n)))
    out = _mont_mul_call(nl, npad, block, interpret)(a, b)
    return out[:, :n]
