"""Shared dispatch fences for the Mosaic (Pallas) kernel fast paths.

Why this exists: on the axon-tunneled backend, certain *compile* signatures
have wedged the remote compiler server-side — the stuck compile then blocks
the device for every subsequent client until the backend recovers on its
own (docs/SCAN_FAULT.md). The 2026-08-17 instance was the unconditional
batch-64 STEP program containing Mosaic attention custom-calls (the CFG
batch-128 program compiled fine the same day). Because a single bad compile
takes the shared device down for hours, the fence errs on the side of
falling back to the equivalence-tested XLA formulations.

Like the sampler's scan fence (diffusion/sampler.py::
_known_bad_scan_signature), the default denylist is EMPTY — the mechanism
stays wired so a regression can be fenced without code changes:

    DIFFUSYNTH_BAD_STEP_BATCHES=64        # batch dims as seen by the kernel
    DIFFUSYNTH_BAD_STEP_BATCHES=64,96     # (CFG doubles the sampler batch)

When set, any Mosaic kernel dispatch (attention_site, convnext_body) whose
input batch dim is in the list falls back to the XLA reference formulation
with a one-time warning, even if the caller forced use_pallas=True.
"""

from __future__ import annotations

import os
import warnings
from typing import Set

_ENV = "DIFFUSYNTH_BAD_STEP_BATCHES"
_warned: Set[int] = set()


def known_bad_step_batch(batch: int) -> bool:
    """True if Mosaic kernels must not be compiled at this batch dim.

    Reads the denylist from the environment on every call (cheap: trace
    time only) so tests and operators can toggle it without reimporting.
    """
    raw = os.environ.get(_ENV, "")
    if not raw:
        return False
    try:
        bad = {int(v) for v in raw.split(",") if v.strip()}
    except ValueError:
        warnings.warn(f"{_ENV}={raw!r} is not a comma-separated int list; "
                      f"ignoring", stacklevel=2)
        return False
    if batch not in bad:
        return False
    if batch not in _warned:
        _warned.add(batch)
        warnings.warn(
            f"Mosaic kernel dispatch fenced at batch {batch} "
            f"({_ENV}={raw}): falling back to the XLA formulation to avoid "
            f"a known remote-compiler wedge (docs/SCAN_FAULT.md, "
            f"2026-08-17 appendix)", stacklevel=3)
    return True
