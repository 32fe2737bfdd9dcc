"""Pairing dispatch: native C++ tower when available, golden otherwise.

The reference's pairing is blst C (`Pairing.pairing`, curve.ml:64-72); this
module plays the same role for the protocols — the golden implementation
(golden/pairing.py) stays the differential oracle.

Set ZUKELANG_NATIVE_PAIRING=0 to force the golden path.
"""

from __future__ import annotations

import os

from .golden.pairing import multi_pairing as _golden_multi
from .golden.pairing import pairing as _golden_pairing
from .golden.curve import GT


def _native_enabled() -> bool:
    return os.environ.get("ZUKELANG_NATIVE_PAIRING", "1") != "0"


def pairing(p, q) -> GT:
    if _native_enabled():
        from . import native
        r = native.gt_pairing(p, q)
        if r is not None:
            return r
    return _golden_pairing(p, q)


def multi_pairing(pairs) -> GT:
    if _native_enabled():
        from . import native
        r = native.gt_multi_pairing(list(pairs))
        if r is not None:
            return r
    return _golden_multi(pairs)
