"""Shared dispatch fences for the Mosaic (Pallas) kernel fast paths.

Why this exists: on the axon-tunneled backend, certain *compile* signatures
have wedged the remote compiler server-side — the stuck compile then blocks
the device for every subsequent client until the backend recovers on its
own (docs/SCAN_FAULT.md). The 2026-08-17 instance was the unconditional
batch-64 STEP program containing Mosaic attention custom-calls (the CFG
batch-128 program compiled fine the same day). Because a single bad compile
takes the shared device down for hours, the fence errs on the side of
falling back to the equivalence-tested XLA formulations.

Unlike the sampler's scan fence (diffusion/sampler.py::
_known_bad_scan_signature, whose fault no longer reproduces and whose
denylist is therefore empty), this fence ships with a DEFAULT denylist of
{64}: the batch-64 step program is the CONFIRMED 2026-08-17 wedge signature
and, absent a fence, any library caller (harness config-2 at cfg=1.0, a
bench sweep, a direct pipeline user with batchsize=64 and no negative
prompt) could compile it accidentally. The XLA fallback the fence selects
is equivalence-tested and its compile was never observed to wedge.

    DIFFUSYNTH_BAD_STEP_BATCHES unset     # default: {64}
    DIFFUSYNTH_BAD_STEP_BATCHES=none      # clear (backend known fixed)
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
_DEFAULT_BAD: Set[int] = {64}   # confirmed wedge (docs/SCAN_FAULT.md)
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
            f"a known remote-compiler wedge (docs/SCAN_FAULT.md, "
            f"2026-08-17 appendix); set {_ENV}=none to clear", stacklevel=3)
    return True
