import os
import jax.numpy as jnp
import jax
import pytest


def test_aot_roundtrip(tmp_path, monkeypatch):
    """maybe_call: builds an export blob on first use, reloads it on the
    next (fresh-memo) use, and both paths compute the jit result."""
    from zukelang_tpu import aot
    monkeypatch.setenv("ZUKELANG_AOT", "1")
    monkeypatch.setattr(aot, "_DIR", str(tmp_path))
    aot._memo.clear()

    calls = {"n": 0}

    def f(x, y):
        calls["n"] += 1
        return x * 2 + y

    jf = jax.jit(f)
    x = jnp.arange(8, dtype=jnp.int32)
    y = jnp.ones(8, dtype=jnp.int32)
    out1 = aot.maybe_call("unit-test-prog", jf, x, y)
    assert (jnp.asarray(out1) == x * 2 + y).all()
    blobs = [p for p in os.listdir(tmp_path) if p.endswith(".jaxexp")]
    assert len(blobs) == 1

    aot._memo.clear()          # simulate a fresh process
    calls["n"] = 0
    out2 = aot.maybe_call("unit-test-prog", jf, x, y)
    assert (jnp.asarray(out2) == x * 2 + y).all()
    assert calls["n"] == 0     # deserialized: python fn never re-traced

    monkeypatch.setenv("ZUKELANG_AOT", "")
    out3 = aot.maybe_call("unit-test-prog", jf, x, y)
    assert (jnp.asarray(out3) == x * 2 + y).all()


def test_aot_disabled_is_passthrough(monkeypatch):
    from zukelang_tpu import aot
    monkeypatch.delenv("ZUKELANG_AOT", raising=False)
    jf = jax.jit(lambda x: x + 1)
    x = jnp.arange(4)
    assert (jnp.asarray(aot.maybe_call("k", jf, x)) == x + 1).all()
