"""The driver's multi-chip dry-run must work inline (virtual-CPU pytest
env) — the subprocess path is exercised by running it from a bare process
(see __graft_entry__.dryrun_multichip docstring)."""

import __graft_entry__ as g


def test_dryrun_multichip_inline():
    # conftest provides 8 virtual CPU devices, so this takes the inline path.
    g.dryrun_multichip(8)
