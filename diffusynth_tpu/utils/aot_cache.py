"""Disk cache of compiled TPU executables (AOT).

The axon remote compiler bypasses JAX's persistent compilation cache
(measured: no effect, benchmarks/RESULTS_r1.md), so every process pays
multi-minute compiles: ~3 min for the batch-64 sampling scan, ~19 min cold
start for the track renderer's per-width programs. This cache serializes
compiled executables (jax.experimental.serialize_executable) keyed by the
SHA-256 of the lowered StableHLO plus the JAX version and device kind, and
reloads them in later processes without compiling.

Usage — a drop-in jit wrapper:

    from diffusynth_tpu.utils.aot_cache import aot_jit
    step = aot_jit(body, name="ddim_step")
    y = step(x, t)          # first process: compile + persist
                            # later processes: load, no compile

Two keying modes:
  * exact (always on): key = SHA-256 of the lowered StableHLO text —
    requires tracing + lowering the function first (~30-170 s of host
    time for the big sampler/decode programs on this 1-core box,
    benchmarks/cold_start_breakdown.py).
  * fast (opt-in per call site via fast_key=...): the call site supplies
    its full program identity (configs, schedule digests, geometry); the
    key is then computable WITHOUT tracing, and warm-cache processes
    deserialize directly. Wrong/incomplete identities degrade to a
    recompile via the exact path — they never silently load a stale
    program unless the caller's identity genuinely under-describes the
    closure (which is why each site documents what it must include).

Environment:
    DIFFUSYNTH_AOT_CACHE=0        disable (plain jax.jit behavior)
    DIFFUSYNTH_AOT_FAST=0         disable only the fast-key path
    DIFFUSYNTH_AOT_CACHE_DIR=...  cache directory
    (default ~/.cache/diffusynth_tpu/aot)

Correctness: the key is the full lowered program text, so any change to
code, shapes, dtypes, or static arguments produces a different key. A
failed deserialize (e.g. different runtime version) falls back to a fresh
compile and overwrites the entry.
"""

from __future__ import annotations

import functools
import hashlib
import json
import os
import pickle
import threading
import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax


_GLOBAL_STATS = {"hits": 0, "misses": 0, "bypass": 0}


def _enabled() -> bool:
    return os.environ.get("DIFFUSYNTH_AOT_CACHE", "1") not in ("0", "false")


def _fast_enabled() -> bool:
    return os.environ.get("DIFFUSYNTH_AOT_FAST", "1") not in ("0", "false")


_CODE_DIGEST: Optional[str] = None


def _code_digest() -> str:
    """Content hash of every .py file in the diffusynth_tpu package —
    part of the fast-key fingerprint so ANY source change invalidates
    fast-key entries (they then fall back to the exact lowered-text
    path and re-index)."""
    global _CODE_DIGEST
    if _CODE_DIGEST is None:
        import diffusynth_tpu

        root = Path(diffusynth_tpu.__file__).parent
        h = hashlib.sha256()
        for p in sorted(root.rglob("*.py")):
            h.update(p.as_posix().encode())
            h.update(p.read_bytes())
        _CODE_DIGEST = h.hexdigest()
    return _CODE_DIGEST


# The library env vars that actually change what a program LOWERS to
# (kernel fences, dispatch gates, prefix sharing — grep os.environ in
# diffusynth_tpu/). Driver-side knobs (DIFFUSYNTH_BENCH_*,
# DIFFUSYNTH_HARNESS_*) select WHICH programs get built — that identity
# lives in the call sites' fast_key — and must NOT poison the
# fingerprint (caught live: a bench knob caused spurious fast-key
# misses for identical programs).
_LOWERING_ENV = ("DIFFUSYNTH_BAD_STEP_BATCHES",
                 "DIFFUSYNTH_BAD_SCAN_BATCHES",
                 "DIFFUSYNTH_CFG_PREFIX_SHARE",
                 "DIFFUSYNTH_BODY_PALLAS",
                 "DIFFUSYNTH_CONV_MODE",
                 "DIFFUSYNTH_GN_BARRIER")


def _env_fingerprint() -> str:
    """Environment that can change what a program lowers to: the kernel
    fences/gates above, plus XLA/JAX flags."""
    items = sorted(
        (k, v) for k, v in os.environ.items()
        if k in _LOWERING_ENV or k in ("XLA_FLAGS", "JAX_PLATFORMS")
        or k.startswith("JAX_")
    )
    return repr(items)


def cache_dir() -> Path:
    d = os.environ.get("DIFFUSYNTH_AOT_CACHE_DIR")
    if d:
        return Path(d)
    return Path.home() / ".cache" / "diffusynth_tpu" / "aot"


def _abstract_signature(args, static_kwargs) -> Tuple:
    """Shape/dtype key for dynamic args; value key for static kwargs.

    Python numeric leaves in `args` are TRACED by jax.jit (weak-typed), so
    they key by type, not value — keying by repr would lower a fresh
    program per distinct scalar where plain jit reuses one (advisor
    finding r1). Static kwargs key by value, as jit itself does.
    """
    def describe(leaf):
        if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
            return ("arr", tuple(leaf.shape), str(leaf.dtype))
        if isinstance(leaf, (bool, int, float, complex)):
            return ("num", type(leaf).__name__)
        return ("py", repr(leaf))

    leaves, treedef = jax.tree_util.tree_flatten(args)
    static = tuple((k, repr(v)) for k, v in sorted(static_kwargs.items()))
    return (str(treedef), tuple(describe(x) for x in leaves), static)


def _execution_devices(compiled) -> list:
    """Device set a jax.stages.Compiled executable was built for (union of
    its input/output sharding device sets), in stable id order."""
    devs = set()
    try:
        leaves = (jax.tree_util.tree_leaves(compiled.input_shardings)
                  + jax.tree_util.tree_leaves(compiled.output_shardings))
        for s in leaves:
            devs |= set(getattr(s, "device_set", ()) or ())
    except Exception:  # noqa: BLE001
        pass
    if not devs:
        return list(jax.devices()[:1])
    return sorted(devs, key=lambda d: d.id)


class AotJit:
    """jax.jit with a persistent compiled-executable cache per shape
    signature. Transparent on CPU/interpret backends and when disabled."""

    def __init__(self, fn: Callable, *, name: Optional[str] = None,
                 static_argnames: Sequence[str] = (),
                 enabled: Optional[bool] = None,
                 fast_key: Optional[object] = None):
        """fast_key: opt-in program identity for the FAST load path. The
        slow path traces + lowers the function to hash the StableHLO —
        30-170 s of host time for the big sampler/decode programs
        (measured, benchmarks/cold_start_breakdown.py r4). When the call
        site can describe everything its closure bakes into the program
        (configs, schedule arrays, geometry), pass it here: later
        processes then key the disk entry by
        sha256(jax version, device kind+count, package code digest, env
        fingerprint, repr(fast_key), abstract arg signature) and
        deserialize DIRECTLY, skipping trace/lower entirely. Any miss or
        load failure falls back to the exact lowered-text path and
        re-records the index entry, so a wrong/incomplete fast_key can
        cost a recompile but never load the wrong program unless the
        caller's identity genuinely under-describes the closure."""
        self._fn = fn
        self._fast_key = fast_key
        self._name = name or getattr(fn, "__name__", "fn")
        self._static_argnames = tuple(static_argnames)
        self._jitted = jax.jit(fn, static_argnames=self._static_argnames) \
            if self._static_argnames else jax.jit(fn)
        if self._static_argnames:
            import inspect

            self._sig = inspect.signature(fn)
        self._enabled = enabled
        self._compiled: Dict[Tuple, Any] = {}
        self._jitted_static: Dict[Tuple, Any] = {}
        self._lock = threading.Lock()
        self.stats = {"hits": 0, "misses": 0, "bypass": 0}

    def _bump(self, key: str) -> None:
        """Count on the instance AND the process-wide totals — instances
        can be short-lived (model inits), but global_stats() must still
        see their hits/misses for cache-state attribution."""
        self.stats[key] += 1
        _GLOBAL_STATS[key] += 1

    def _cache_size(self) -> int:
        """Distinct compiled programs (parity with jax.jit's accounting —
        tests use it to pin one-program-per-shape claims)."""
        n = len(self._compiled) + self._jitted._cache_size()
        for j in self._jitted_static.values():
            if j is not self._jitted:
                n += j._cache_size()
        return n

    def _use_cache(self) -> bool:
        if self._enabled is not None:
            return self._enabled
        if not _enabled():
            return False
        backend = jax.default_backend()
        if backend == "cpu":
            return False
        # Tunneled devices (axon remote backend): ON by default since r3.
        # In r2 loading pushed the program binary through the tunnel at
        # ~0.3 MB/s (285 s for an 83 MB U-Net forward vs a 29 s fresh
        # compile) and the cache auto-disabled here; the backend has since
        # been updated and loads were re-measured at 1-2 s for the 121 MB
        # headline sampler step across three runs (RESULTS_r3.md section
        # 8) vs 28-680 s compiles. Loads print their wall time — if the
        # slow-upload behavior ever returns, DIFFUSYNTH_AOT_CACHE=0 turns
        # the cache off.
        return True

    def __call__(self, *args, **kwargs):
        if not self._use_cache():
            self._bump("bypass")
            return self._jitted(*args, **kwargs)
        if self._static_argnames:
            # Resolve statics by NAME regardless of call style (a static
            # passed positionally must key by VALUE — jax.jit matches
            # static_argnames against positionals the same way). Dynamics
            # then travel as keywords end-to-end (lower/compile/execute
            # accept them), which sidesteps positional re-ordering after
            # the statics are partial-bound out.
            try:
                bound = self._sig.bind(*args, **kwargs)
            except TypeError:
                self._bump("bypass")
                return self._jitted(*args, **kwargs)
            static_kw, dyn = {}, {}
            for k, v in bound.arguments.items():
                (static_kw if k in self._static_argnames else dyn)[k] = v
            sig = _abstract_signature(((), tuple(sorted(dyn))), static_kw) \
                + _abstract_signature(tuple(dyn[k] for k in sorted(dyn)), {})
            call_args, call_kw = (), dyn
        else:
            sig = _abstract_signature(args, {})
            static_kw, call_args, call_kw = {}, args, {}
            if kwargs:   # dynamic kwargs on a static-less fn: bypass
                self._bump("bypass")
                return self._jitted(*args, **kwargs)
        with self._lock:
            compiled = self._compiled.get(sig)
        if compiled is None:
            fk = self._fast_digest(sig)
            compiled = self._fast_load(fk) if fk else None
            if compiled is None:
                compiled = self._load_or_compile(call_args, static_kw,
                                                 call_kw, fast_digest=fk)
            with self._lock:
                self._compiled[sig] = compiled
        return compiled(*call_args, **call_kw)

    # -- fast path: skip trace/lower when the call site supplied identity --

    def _fast_digest(self, sig) -> Optional[str]:
        if self._fast_key is None or not _fast_enabled():
            return None
        dev = jax.devices()[0]
        h = hashlib.sha256()
        import flax

        # flax is pinned alongside jax: a flax upgrade can change what a
        # module lowers to, which the exact (lowered-text) path would
        # catch but an identity-keyed fast entry would not (advisor r4).
        for part in (jax.__version__, flax.__version__,
                     getattr(dev, "device_kind", str(dev)),
                     str(jax.device_count()), self._name, _code_digest(),
                     _env_fingerprint(), repr(self._fast_key), repr(sig)):
            h.update(part.encode())
            h.update(b"\x00")
        return h.hexdigest()[:24]

    def _index_path(self) -> Path:
        return cache_dir() / f"{self._name}-fastindex.json"

    def _fast_load(self, fk: str):
        from jax.experimental import serialize_executable as se

        try:
            with open(self._index_path()) as f:
                index = json.load(f)
            entry = index.get(fk)
            if not entry:
                return None
            path = cache_dir() / entry
            t0 = time.time()
            with open(path, "rb") as f:
                raw = f.read()
            if raw[:4] == b"DSZ1":
                import zlib

                raw = zlib.decompress(raw[4:])
            payload, in_tree, out_tree, dev_ids = pickle.loads(raw)
            by_id = {d.id: d for d in jax.devices()}
            loaded = se.deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=[by_id[i] for i in dev_ids])
            self._bump("hits")
            print(f"[aot-cache] {self._name}: fast-keyed load of "
                  f"{entry} in {time.time()-t0:.1f}s (no trace/lower)",
                  flush=True)
            return loaded
        except FileNotFoundError:
            return None
        except Exception as e:  # noqa: BLE001 — fall back to the slow path
            print(f"[aot-cache] {self._name}: fast-key load failed "
                  f"({type(e).__name__}: {e}); falling back to "
                  f"lowered-text keying", flush=True)
            return None

    def _record_fast(self, fk: Optional[str], aot_filename: str) -> None:
        if not fk:
            return
        try:
            path = self._index_path()
            # Exclusive lock across processes for the read-modify-write:
            # two concurrent first-runs of different signatures would
            # otherwise each replace the index with only their own entry
            # (advisor r4 — cost was a spurious re-lower next process).
            import fcntl

            path.parent.mkdir(parents=True, exist_ok=True)
            lock = path.with_suffix(".lock")
            with open(lock, "w") as lf:
                fcntl.flock(lf, fcntl.LOCK_EX)
                index = {}
                if path.exists():
                    try:
                        with open(path) as f:
                            index = json.load(f)
                    except Exception:  # noqa: BLE001 — self-heal corruption
                        index = {}
                index[fk] = aot_filename
                tmp = path.with_suffix(".tmp-%d" % os.getpid())
                with open(tmp, "w") as f:
                    json.dump(index, f, indent=0)
                tmp.replace(path)
        except Exception as e:  # noqa: BLE001 — index is best-effort
            print(f"[aot-cache] {self._name}: fast-index write failed "
                  f"({type(e).__name__}: {e})", flush=True)

    def _jit_for(self, static_kw):
        key = tuple(sorted(static_kw.items()))
        j = self._jitted_static.get(key)
        if j is None:
            j = jax.jit(functools.partial(self._fn, **static_kw)) \
                if static_kw else self._jitted
            self._jitted_static[key] = j
        return j

    def _load_or_compile(self, args, static_kw, kw=None, fast_digest=None):
        from jax.experimental import serialize_executable as se

        lowered = self._jit_for(static_kw).lower(*args, **(kw or {}))
        text = lowered.as_text()
        dev = jax.devices()[0]
        key = hashlib.sha256()
        key.update(jax.__version__.encode())
        key.update(getattr(dev, "device_kind", str(dev)).encode())
        key.update(str(jax.device_count()).encode())
        key.update(text.encode())
        digest = key.hexdigest()[:24]
        path = cache_dir() / f"{self._name}-{digest}.aot"

        if path.exists():
            try:
                t0 = time.time()
                with open(path, "rb") as f:
                    raw = f.read()
                if raw[:4] == b"DSZ1":     # zlib-compressed entry (r3)
                    import zlib

                    raw = zlib.decompress(raw[4:])
                payload, in_tree, out_tree, dev_ids = pickle.loads(raw)
                by_id = {d.id: d for d in jax.devices()}
                loaded = se.deserialize_and_load(
                    payload, in_tree, out_tree,
                    execution_devices=[by_id[i] for i in dev_ids])
                self._bump("hits")
                self._record_fast(fast_digest, path.name)
                print(f"[aot-cache] {self._name}: loaded {path.name} "
                      f"in {time.time()-t0:.1f}s (no compile)", flush=True)
                return loaded
            except Exception as e:  # noqa: BLE001 — fall through to compile
                print(f"[aot-cache] {self._name}: load failed "
                      f"({type(e).__name__}: {e}); recompiling", flush=True)

        t0 = time.time()
        compiled = lowered.compile()
        self._bump("misses")
        try:
            payload, in_tree, out_tree = se.serialize(compiled)
            # Record the device assignment the program was compiled for —
            # e.g. the sampler scan compiled batch-sharded over a mesh must
            # reload onto the same device set, not devices()[:1] (advisor
            # finding r1).
            dev_ids = [d.id for d in _execution_devices(compiled)]
            path.parent.mkdir(parents=True, exist_ok=True)
            tmp = path.with_suffix(".tmp-%d" % os.getpid())
            blob = pickle.dumps((payload, in_tree, out_tree, dev_ids))
            note = ""
            if os.environ.get("DIFFUSYNTH_AOT_COMPRESS", "1") != "0":
                # Disk-size win only: deserialize_and_load hands PJRT the
                # RAW payload, so the tunnel upload (the 0.3 MB/s
                # bottleneck) is unchanged by on-disk compression —
                # measured in benchmarks/aot_cold_start.py (r3).
                import zlib

                comp = zlib.compress(blob, 6)
                note = f" ({len(comp)/1e6:.1f} MB zlib)"
                blob = b"DSZ1" + comp
            with open(tmp, "wb") as f:
                f.write(blob)
            tmp.replace(path)
            self._record_fast(fast_digest, path.name)
            print(f"[aot-cache] {self._name}: compiled in "
                  f"{time.time()-t0:.1f}s, cached {len(payload)/1e6:.1f} MB"
                  f"{note} -> {path.name}", flush=True)
        except Exception as e:  # noqa: BLE001 — cache is best-effort
            print(f"[aot-cache] {self._name}: serialize failed "
                  f"({type(e).__name__}: {e}); caching skipped", flush=True)
        return compiled


def global_stats() -> Dict[str, int]:
    """Process-wide hit/miss/bypass totals across every AotJit instance
    ever created (including ones since garbage-collected — counters
    accumulate in _GLOBAL_STATS at bump time, not by walking instances).

    Lets the benchmark/serving artifacts record the CACHE STATE of a run
    (all-hits = warm cache; any miss = a compile happened) so a slow run
    is attributable from the JSON alone."""
    return dict(_GLOBAL_STATS)


def aot_jit(fn: Callable, *, name: Optional[str] = None,
            static_argnames: Sequence[str] = (),
            enabled: Optional[bool] = None,
            fast_key: Optional[object] = None) -> AotJit:
    """Drop-in jax.jit replacement with the persistent executable cache.

    fast_key (opt-in): see AotJit.__init__ — lets later processes skip
    the 30-170 s trace/lower step entirely for big programs."""
    return AotJit(fn, name=name, static_argnames=static_argnames,
                  enabled=enabled, fast_key=fast_key)
