"""AOT program cache: jax.export blobs that survive process restarts.

The XLA/Mosaic compile cache (jax_setup) removes the COMPILE cost of a
fresh process, but jaxpr tracing + StableHLO lowering are re-paid every
process — and for this package's multi-limb programs that is the wall:
the fused 4-MSM Groth16 G1 program alone traces in ~406 s (measured,
2^16 terms, c=13; millions of jaxpr equations from unrolled limb
arithmetic).  This module serializes the lowered module once
(`jax.export`) and reloads it in later processes, skipping trace+lower
entirely; the compile of the deserialized module is covered by the same
persistent compile cache.

Opt-in via ZUKELANG_AOT=1 (the bench sets it): export requires a real
TPU lowering target, and CPU test tiers run Pallas in interpret mode
where export is unsupported.  Call sites go through `maybe_call`, which
is a transparent passthrough when disabled.

No reference counterpart (the OCaml reference has no compiler at all);
this is the TPU-native answer to its "start the binary, prove
immediately" property (test/test.ml:25-97 runs keygen+prove in-process
with zero startup cost).
"""

from __future__ import annotations

import hashlib
import os
import threading

import jax

_DIR = os.environ.get(
    "ZUKELANG_AOT_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache", "export"))

_memo: dict = {}
_lock = threading.Lock()


def enabled() -> bool:
    return os.environ.get("ZUKELANG_AOT", "") == "1"


def _arg_sig(args) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(args)
    sig = str(treedef) + "|" + ";".join(
        f"{l.dtype}{tuple(l.shape)}" for l in leaves)
    return hashlib.sha256(sig.encode()).hexdigest()[:16]


def _path(key: str, args) -> str:
    safe = "".join(ch if (ch.isalnum() or ch in "-_.") else "_"
                   for ch in key)
    return os.path.join(
        _DIR, f"{safe}-{_arg_sig(args)}-jax{jax.__version__}.jaxexp")


def maybe_call(key: str, jit_fn, *args):
    """Run `jit_fn(*args)` through the AOT export cache when enabled.

    First process: trace+lower once, serialize the Exported to disk,
    call through it (so the compile cache warms the SAME module later
    processes will run).  Later processes: deserialize (no tracing) and
    call; compile is a disk-cache hit.  Any export/deserialize failure
    falls back to the plain jit call — slower, never wrong.
    """
    if not enabled():
        return jit_fn(*args)
    path = _path(key, args)
    with _lock:
        exported = _memo.get(path)
    if exported is None:
        try:
            if os.path.exists(path):
                with open(path, "rb") as f:
                    exported = jax.export.deserialize(bytearray(f.read()))
            else:
                exported = jax.export.export(jit_fn)(*args)
                os.makedirs(_DIR, exist_ok=True)
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(exported.serialize())
                os.replace(tmp, path)
        except Exception as e:  # pragma: no cover - fallback, never wrong
            print(f"[aot] {key}: falling back to jit "
                  f"({type(e).__name__}: {str(e)[:120]})", flush=True)
            return jit_fn(*args)
        with _lock:
            _memo[path] = exported
    return exported.call(*args)
