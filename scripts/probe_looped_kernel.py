#!/usr/bin/env python
"""Compile-time/runtime probe: unrolled CIOS kernel body vs a fori_loop
over the outer limb index (body ~24x smaller -> Mosaic compile should
collapse; op stream per iteration is identical).

Usage: python scripts/probe_looped_kernel.py [logN]
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zukelang_tpu import jax_setup  # noqa: F401
from zukelang_tpu import params
from zukelang_tpu.ops import field_jax as F
from zukelang_tpu.ops import pallas_kernels as PK

MASK16 = 0xFFFF


def _mont_mul_kernel_looped(a_ref, b_ref, o_ref, *, nl, p_limbs, nprime):
    mask = jnp.uint32(MASK16)
    npr = jnp.uint32(nprime)
    pl_const = [jnp.uint32(int(x)) for x in p_limbs]

    b = [b_ref[j, :] for j in range(nl)]
    zero = jnp.zeros_like(b[0])

    def body(i, t):
        t = list(t)
        ai = jnp.squeeze(a_ref[pl.ds(i, 1), :], axis=0)
        for j in range(nl):
            prod = ai * b[j]
            t[j] = t[j] + (prod & mask)
            t[j + 1] = t[j + 1] + (prod >> 16)
        m = ((t[0] & mask) * npr) & mask
        for j in range(nl):
            prod = m * pl_const[j]
            t[j] = t[j] + (prod & mask)
            t[j + 1] = t[j + 1] + (prod >> 16)
        carry0 = t[0] >> 16
        t = t[1:] + [zero]
        t[0] = t[0] + carry0
        return tuple(t)

    t = jax.lax.fori_loop(0, nl, body, tuple([zero] * (nl + 1)))

    limbs = []
    c = zero
    for j in range(nl + 1):
        v = t[j] + c
        limbs.append(v & mask)
        c = v >> 16
    pl_ext = pl_const + [jnp.uint32(0)]
    borrow = zero
    diff = []
    for j in range(nl + 1):
        d = limbs[j] - pl_ext[j] - borrow
        borrow = (d >> 31) & jnp.uint32(1)
        diff.append(d & mask)
    ge = borrow == 0
    for j in range(nl):
        o_ref[j, :] = jnp.where(ge, diff[j], limbs[j])


@functools.lru_cache(maxsize=8)
def _looped_call(nl, n, block):
    spec = F.FR if nl == params.FR_LIMBS else F.FQ
    kernel = functools.partial(
        _mont_mul_kernel_looped, nl=nl,
        p_limbs=tuple(int(x) for x in spec.p_limbs), nprime=spec.nprime)
    return jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nl, n), jnp.uint32),
        grid=(n // block,),
        in_specs=[pl.BlockSpec((nl, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((nl, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nl, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    ))


def bench(name, fn, a, b, reps=5):
    t0 = time.time()
    out = fn(a, b)
    jax.device_get(out[..., :1])
    first = time.time() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(a, b)
        jax.device_get(out[..., :1])
        best = min(best, time.time() - t0)
    n = a.shape[1]
    print(f"{name:24s} first(compile) {first:8.2f}s   "
          f"best {best*1e3:8.2f} ms  ({n/best/1e6:.0f} Mmul/s)", flush=True)
    return out


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << logn
    nl = F.FQ.nl
    rng = np.random.RandomState(3)
    vals_a = [int.from_bytes(rng.bytes(47), "little") % params.P
              for _ in range(256)]
    vals_b = [int.from_bytes(rng.bytes(47), "little") % params.P
              for _ in range(256)]
    a = jnp.tile(jnp.asarray(F.pack_mont(vals_a, F.FQ)), (1, n // 256))
    b = jnp.tile(jnp.asarray(F.pack_mont(vals_b, F.FQ)), (1, n // 256))

    block = 512
    looped = _looped_call(nl, n, block)
    out_l = bench("looped fori CIOS", looped, a, b)

    unrolled = PK._mont_mul_call(nl, n, block, False)
    out_u = bench("unrolled CIOS", unrolled, a, b)

    same = bool(jnp.all(out_l == out_u))
    print("outputs identical:", same, flush=True)
    assert same


if __name__ == "__main__":
    main()
