"""Persistent AOT executable cache mechanics (CPU executables serialize
through the same jax.experimental.serialize_executable path)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_aot_jit_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("DIFFUSYNTH_AOT_CACHE_DIR", str(tmp_path))
    from diffusynth_tpu.utils.aot_cache import aot_jit

    def f(x, y):
        return jnp.tanh(x @ y) * 2.0

    x = jnp.full((16, 16), 0.25, jnp.float32)

    g1 = aot_jit(f, name="t", enabled=True)
    r1 = g1(x, x)
    assert g1.stats["misses"] == 1
    files = list(tmp_path.glob("t-*.aot"))
    assert len(files) == 1

    # Fresh wrapper (new "process"): loads from disk, no compile.
    g2 = aot_jit(f, name="t", enabled=True)
    r2 = g2(x, x)
    assert g2.stats["hits"] == 1 and g2.stats["misses"] == 0
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2))

    # Same wrapper, repeated call: in-memory executable, still one entry.
    g2(x, x)
    assert g2.stats["hits"] == 1

    # Different shape -> different program -> second cache entry.
    y = jnp.full((8, 8), 0.5, jnp.float32)
    g2(y, y)
    assert len(list(tmp_path.glob("t-*.aot"))) == 2


def test_aot_jit_static_args(tmp_path, monkeypatch):
    monkeypatch.setenv("DIFFUSYNTH_AOT_CACHE_DIR", str(tmp_path))
    from diffusynth_tpu.utils.aot_cache import aot_jit

    def f(x, scale=1.0):
        return x * scale

    g = aot_jit(f, name="s", static_argnames=("scale",), enabled=True)
    a = g(jnp.ones((4,)), scale=2.0)
    b = g(jnp.ones((4,)), scale=3.0)
    assert float(a.sum()) == 8.0 and float(b.sum()) == 12.0
    assert g.stats["misses"] == 2


def test_disabled_bypasses(tmp_path, monkeypatch):
    monkeypatch.setenv("DIFFUSYNTH_AOT_CACHE_DIR", str(tmp_path))
    from diffusynth_tpu.utils.aot_cache import aot_jit

    g = aot_jit(lambda x: x + 1, name="d", enabled=False)
    assert float(g(jnp.zeros((2,))).sum()) == 2.0
    assert g.stats["bypass"] == 1
    assert not list(tmp_path.glob("*.aot"))
