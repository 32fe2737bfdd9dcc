"""ctypes bindings for the C++ host backend (native/zukelang_native.cpp).

Builds the shared library on first use with g++ (cached next to the
source).  Degrades gracefully: `available()` is False when no toolchain is
present and callers fall back to the golden path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

from .. import params
from ..golden.curve import G1
from ..golden.field import Fq, Fr

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "native", "zukelang_native.cpp")
_LIB = os.path.join(_HERE, "..", "..", "native", "libzukelang_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        assert lib.native_abi_version() == 1
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


# -- converters --------------------------------------------------------------

def _frs_to_bytes(xs: List[Fr]) -> bytes:
    return b"".join(x.n.to_bytes(32, "little") for x in xs)


def _bytes_to_frs(b: bytes) -> List[Fr]:
    return [Fr(int.from_bytes(b[i * 32:(i + 1) * 32], "little"))
            for i in range(len(b) // 32)]


def _g1s_to_bytes(pts: List[G1]) -> bytes:
    out = bytearray()
    for p in pts:
        if p.is_zero():
            out += bytes(96) + b"\x01"
        else:
            out += p.x.n.to_bytes(48, "little")
            out += p.y.n.to_bytes(48, "little")
            out += b"\x00"
    return bytes(out)


def _bytes_to_g1(b: bytes) -> G1:
    if b[96]:
        return G1.zero()
    x = int.from_bytes(b[:48], "little")
    y = int.from_bytes(b[48:96], "little")
    return G1(Fq(x), Fq(y))


# -- API ---------------------------------------------------------------------

def fr_mul_batch(a: List[Fr], b: List[Fr]) -> List[Fr]:
    lib = _load()
    n = len(a)
    out = ctypes.create_string_buffer(32 * n)
    lib.fr_mul_batch(_frs_to_bytes(a), _frs_to_bytes(b), out,
                     ctypes.c_int64(n))
    return _bytes_to_frs(out.raw)


def fr_inv_batch(a: List[Fr]) -> List[Fr]:
    lib = _load()
    n = len(a)
    out = ctypes.create_string_buffer(32 * n)
    lib.fr_inv_batch(_frs_to_bytes(a), out, ctypes.c_int64(n))
    return _bytes_to_frs(out.raw)


def fr_ntt(values: List[Fr], inverse: bool = False) -> List[Fr]:
    lib = _load()
    n = len(values)
    assert n & (n - 1) == 0
    logn = n.bit_length() - 1
    from ..ops.ntt import root_for
    w = root_for(logn, inverse)
    buf = ctypes.create_string_buffer(_frs_to_bytes(values), 32 * n)
    ninv = pow(n, -1, params.R)
    lib.fr_ntt(buf, ctypes.c_int64(logn),
               w.to_bytes(32, "little"), ctypes.c_int(1 if inverse else 0),
               ninv.to_bytes(32, "little"))
    return _bytes_to_frs(buf.raw)


def g1_msm(points: List[G1], scalars: List[Fr]) -> G1:
    lib = _load()
    n = len(points)
    out = ctypes.create_string_buffer(97)
    lib.g1_msm(_g1s_to_bytes(points), _frs_to_bytes(scalars),
               ctypes.c_int64(n), out)
    return _bytes_to_g1(out.raw)


def g1_scalar_mul(point: G1, scalar: Fr) -> G1:
    lib = _load()
    out = ctypes.create_string_buffer(97)
    lib.g1_scalar_mul(_g1s_to_bytes([point]), scalar.n.to_bytes(32, "little"),
                      out)
    return _bytes_to_g1(out.raw)


def gt_multi_pairing(pairs):
    """prod_i e(P_i, Q_i) via the C++ tower (one shared final
    exponentiation); returns a golden GT, or None when the native backend
    is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "gt_multi_pairing"):
        return None
    from ..golden.curve import GT
    from ..golden.field import Fq12, Fq6, Fq2

    n = len(pairs)
    g1b = bytearray(96 * n)
    g1i = bytearray(n)
    g2b = bytearray(192 * n)
    g2i = bytearray(n)
    for i, (p, q) in enumerate(pairs):
        if p.is_zero():
            g1i[i] = 1
        else:
            g1b[i * 96:i * 96 + 48] = p.x.n.to_bytes(48, "little")
            g1b[i * 96 + 48:i * 96 + 96] = p.y.n.to_bytes(48, "little")
        if q.is_zero():
            g2i[i] = 1
        else:
            o = i * 192
            g2b[o:o + 48] = q.x.c0.n.to_bytes(48, "little")
            g2b[o + 48:o + 96] = q.x.c1.n.to_bytes(48, "little")
            g2b[o + 96:o + 144] = q.y.c0.n.to_bytes(48, "little")
            g2b[o + 144:o + 192] = q.y.c1.n.to_bytes(48, "little")
    out = bytes(576)
    lib.gt_multi_pairing(bytes(g1b), bytes(g1i), bytes(g2b), bytes(g2i),
                         ctypes.c_int64(n), out)
    vals = [int.from_bytes(out[i * 48:(i + 1) * 48], "little")
            for i in range(12)]
    f2 = [Fq2.of_ints(vals[2 * i], vals[2 * i + 1]) for i in range(6)]
    return GT(Fq12(Fq6(f2[0], f2[1], f2[2]), Fq6(f2[3], f2[4], f2[5])))


def gt_pairing(p, q):
    return gt_multi_pairing([(p, q)])
