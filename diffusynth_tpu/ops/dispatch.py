"""Shared dispatch fences for the Mosaic (Pallas) kernel fast paths.

Why this exists: on the axon-tunneled backend, certain *compile* signatures
have wedged the remote compiler server-side — the stuck compile then blocks
the device for every subsequent client until the backend recovers on its
own (docs/SCAN_FAULT.md). The 2026-08-17 instance was the unconditional
batch-64 STEP program containing Mosaic attention custom-calls (the CFG
batch-128 program compiled fine the same day). Because a single bad compile
takes the shared device down for hours, the fence errs on the side of
falling back to the equivalence-tested XLA formulations.

History of the default denylist:
  * r3 (2026-08-20): shipped with {64} — the confirmed 2026-08-17 wedge
    signature — because the signature was unprobed on the then-current
    backend.
  * r4 (2026-08-20): the probe ran at round start per docs/SCAN_FAULT.md:
    TWO independent fresh compiles of the exact wedge signature
    (unconditional batch-64 step program WITH Mosaic attention sites,
    harness config 2 at cfg=1.0) compiled in 33-34 s and ran clean
    (9.77/9.80 s p50, 6.55/6.53 timbres/s/chip — faster than the fenced
    XLA fallback's 10.31 s). The backend fixed it, like the r1 scan fault
    and the r2 AOT slow-load. The DEFAULT denylist is therefore EMPTY
    again; the mechanism stays wired for the next regression.

    DIFFUSYNTH_BAD_STEP_BATCHES unset     # default: {} (r4 probe clean)
    DIFFUSYNTH_BAD_STEP_BATCHES=none      # explicit clear
    DIFFUSYNTH_BAD_STEP_BATCHES=64,96     # explicit list (batch dims as
                                          #  seen by the kernel; CFG doubles
                                          #  the sampler batch)

When a batch is fenced, any Mosaic kernel dispatch (attention_site,
convnext_body) with that input batch dim falls back to the XLA reference
formulation with a one-time warning, even if the caller forced
use_pallas=True.
"""

from __future__ import annotations

import os
import warnings
from typing import Set

_ENV = "DIFFUSYNTH_BAD_STEP_BATCHES"
_DEFAULT_BAD: Set[int] = set()   # r4 probe clean (docs/SCAN_FAULT.md)
_warned: Set[int] = set()


def known_bad_step_batch(batch: int) -> bool:
    """True if Mosaic kernels must not be compiled at this batch dim.

    Reads the denylist from the environment on every call (cheap: trace
    time only) so tests and operators can toggle it without reimporting.
    """
    raw = os.environ.get(_ENV)
    if raw is None:
        bad = _DEFAULT_BAD
        origin = "default denylist"
    elif raw.strip() in ("", "none"):
        return False
    else:
        try:
            bad = {int(v) for v in raw.split(",") if v.strip()}
        except ValueError:
            warnings.warn(f"{_ENV}={raw!r} is not a comma-separated int "
                          f"list; ignoring", stacklevel=2)
            return False
        origin = f"{_ENV}={raw}"
    if batch not in bad:
        return False
    if batch not in _warned:
        _warned.add(batch)
        warnings.warn(
            f"Mosaic kernel dispatch fenced at batch {batch} "
            f"({origin}): falling back to the XLA formulation to avoid "
            f"a known remote-compiler wedge (docs/SCAN_FAULT.md); "
            f"set {_ENV}=none to clear", stacklevel=3)
    return True


def describe_fences() -> str:
    """One-line summary of the active kernel fences, for startup banners
    (bench.py, serving): the default denylist is empty since the r4 probe
    came back clean twice, so if the Mosaic wedge ever regresses, a
    banner showing 'step_fence=[] (default)' lets an operator triage in
    one glance and set the env var (advisor r4, docs/SCAN_FAULT.md)."""
    step = os.environ.get(_ENV)
    scan = os.environ.get("DIFFUSYNTH_BAD_SCAN_BATCHES")
    step_s = (f"{_ENV}={step}" if step is not None
              else f"step_fence={sorted(_DEFAULT_BAD)} (default)")
    scan_s = (f"DIFFUSYNTH_BAD_SCAN_BATCHES={scan}" if scan is not None
              else "scan_fence=[] (default)")
    return f"{step_s}; {scan_s}"
