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


def _forbid_slow_path(wrapper, monkeypatch):
    """Make the wrapper's trace/lower path an error (proves fast load)."""
    def boom(*a, **k):
        raise AssertionError("slow path (trace/lower) was taken")
    monkeypatch.setattr(wrapper, "_load_or_compile", boom)


def test_fast_key_skips_lowering(tmp_path, monkeypatch):
    """With fast_key, a fresh wrapper loads the executable WITHOUT the
    trace/lower slow path (the 30-170 s cold-start term for the big
    sampler programs, RESULTS_r4.md section 6) — and a changed identity
    or DIFFUSYNTH_AOT_FAST=0 falls back to it."""
    monkeypatch.setenv("DIFFUSYNTH_AOT_CACHE_DIR", str(tmp_path))
    from diffusynth_tpu.utils.aot_cache import aot_jit

    def f(x):
        return jnp.sin(x) + 1.0

    x = jnp.full((8, 8), 0.5, jnp.float32)
    g1 = aot_jit(f, name="fk", enabled=True, fast_key=("id", 1))
    r1 = g1(x)
    assert g1.stats["misses"] == 1
    assert (tmp_path / "fk-fastindex.json").exists()

    # Fresh wrapper, same identity: must load WITHOUT the slow path.
    g2 = aot_jit(f, name="fk", enabled=True, fast_key=("id", 1))
    _forbid_slow_path(g2, monkeypatch)
    r2 = g2(x)
    assert g2.stats["hits"] == 1 and g2.stats["misses"] == 0
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2))

    # A different identity must NOT take the fast path (re-verifies via
    # the lowered-text key — same text, so still a disk hit).
    calls = []
    g3 = aot_jit(f, name="fk", enabled=True, fast_key=("id", 2))
    orig = g3._load_or_compile
    monkeypatch.setattr(
        g3, "_load_or_compile",
        lambda *a, **k: calls.append(1) or orig(*a, **k))
    g3(x)
    assert calls, "changed fast_key must re-verify via lowering"

    # DIFFUSYNTH_AOT_FAST=0 opts out of the fast path entirely.
    monkeypatch.setenv("DIFFUSYNTH_AOT_FAST", "0")
    g4 = aot_jit(f, name="fk", enabled=True, fast_key=("id", 1))
    calls.clear()
    orig4 = g4._load_or_compile
    monkeypatch.setattr(
        g4, "_load_or_compile",
        lambda *a, **k: calls.append(1) or orig4(*a, **k))
    g4(x)
    assert calls


def test_fast_key_env_fingerprint_scope(monkeypatch):
    """Driver-side knobs (DIFFUSYNTH_BENCH_*, DIFFUSYNTH_HARNESS_*) must
    NOT change the fast-key fingerprint — they select which programs get
    built, not how a given program lowers (caught live r4: a bench knob
    caused spurious fast-key misses). Lowering-relevant fences MUST."""
    from diffusynth_tpu.utils.aot_cache import _env_fingerprint

    base = _env_fingerprint()
    monkeypatch.setenv("DIFFUSYNTH_BENCH_LOOP_MODE", "scan")
    monkeypatch.setenv("DIFFUSYNTH_HARNESS_CFGS", "1.0")
    assert _env_fingerprint() == base
    monkeypatch.setenv("DIFFUSYNTH_BAD_STEP_BATCHES", "64")
    assert _env_fingerprint() != base


def test_fast_key_index_corruption_falls_back(tmp_path, monkeypatch):
    monkeypatch.setenv("DIFFUSYNTH_AOT_CACHE_DIR", str(tmp_path))
    from diffusynth_tpu.utils.aot_cache import aot_jit

    def f(v):
        return v * 3

    x = jnp.ones((4,))
    g1 = aot_jit(f, name="fc", enabled=True, fast_key="k")
    r1 = g1(x)
    (tmp_path / "fc-fastindex.json").write_text("{not json")
    g2 = aot_jit(f, name="fc", enabled=True, fast_key="k")
    np.testing.assert_allclose(np.asarray(g2(x)), np.asarray(r1))
    assert g2.stats["hits"] == 1      # fell back to the lowered-text key
    # An index entry pointing at a missing file must also fall back.
    import json as _json
    idx = _json.loads((tmp_path / "fc-fastindex.json").read_text())
    assert idx, "fallback should have rewritten the index"
    for k in idx:
        idx[k] = "missing.aot"
    (tmp_path / "fc-fastindex.json").write_text(_json.dumps(idx))
    g3 = aot_jit(f, name="fc", enabled=True, fast_key="k")
    np.testing.assert_allclose(np.asarray(g3(x)), np.asarray(r1))


def test_disabled_bypasses(tmp_path, monkeypatch):
    monkeypatch.setenv("DIFFUSYNTH_AOT_CACHE_DIR", str(tmp_path))
    from diffusynth_tpu.utils.aot_cache import aot_jit

    g = aot_jit(lambda x: x + 1, name="d", enabled=False)
    assert float(g(jnp.zeros((2,))).sum()) == 2.0
    assert g.stats["bypass"] == 1
    assert not list(tmp_path.glob("*.aot"))
