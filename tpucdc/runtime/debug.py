"""Debug configuration toggles (SURVEY.md §5.2).

``enable_debug_checks`` flips jax_debug_nans (immediate NaN localization in
the R-D loss — SURVEY.md §7 hard-part 1) and disables the Pallas fast paths
so numerical triage always compares against the reference ops.
"""

from __future__ import annotations

import jax


def enable_debug_checks(nans: bool = True, force_op_fallbacks: bool = True):
    if nans:
        jax.config.update("jax_debug_nans", True)
    if force_op_fallbacks:
        from tpucdc.ops import attention, groupnorm
        groupnorm.set_force_fallback(True)
        attention.set_force_fallback(True)


def disable_debug_checks():
    jax.config.update("jax_debug_nans", False)
    from tpucdc.ops import attention, groupnorm
    groupnorm.set_force_fallback(False)
    attention.set_force_fallback(False)


def maybe_init_distributed() -> bool:
    """Multi-host (DCN) init — required only beyond one host (SURVEY.md §5.8;
    v1 targets single-host v5e-8 where ICI suffices). Safe no-op when the
    coordinator env vars are absent; returns True when initialized.

    Explicit form (tested by tests/integration/test_distributed.py with two
    CPU processes): set TPUCDC_COORDINATOR=host:port, TPUCDC_NUM_PROCESSES
    and TPUCDC_PROCESS_ID. With only COORDINATOR_ADDRESS set, defers to
    jax's own cluster auto-detection."""
    import os
    addr = (os.environ.get("TPUCDC_COORDINATOR")
            or os.environ.get("COORDINATOR_ADDRESS"))
    if not addr:
        return False
    num = int(os.environ.get("TPUCDC_NUM_PROCESSES", "0") or 0)
    pid = int(os.environ.get("TPUCDC_PROCESS_ID", "-1") or -1)
    if num > 0 and pid >= 0:
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=num, process_id=pid)
    else:
        jax.distributed.initialize()
    return True
