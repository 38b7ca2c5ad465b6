"""Shared Mosaic compiler tuning for the Pallas kernels.

Mosaic's scoped-VMEM compile limit defaults to 16 MiB, far below the
v5e's 128 MiB physical VMEM; it is what rejected the r=16 spatial tiles
(17.5 MB working set) and forced the long-T temporal tile shrink
(BENCH_NOTES round 2/3). The client-side ``XLA_FLAGS=
--xla_tpu_scoped_vmem_limit_kib`` route dies at startup through the axon
relay (the local XLA build does not know the TPU flag), but pallas_call's
``compiler_params=pltpu.CompilerParams(vmem_limit_bytes=...)`` travels
*inside* the kernel payload to the server-side Mosaic compile — so the
limit can be raised per kernel.

``VIDTOK_VMEM_LIMIT_MB`` (env, default 0 = Mosaic default) sets the
limit for every fused-kernel ``pallas_call`` in ops/pallas (all of them
route ``mosaic_params()`` into ``compiler_params``) and proportionally
scales the hardware-probed block budgets that were calibrated against
the 16 MiB default. Only *raising* the limit is supported: values below
16 are ignored (budget gates are 16 MiB-calibrated, so a lower server
limit would admit shapes that then fail server-side compile — a relay
HTTP 500 kills the whole program compile). The linear budget scaling is
probe-gated: run tools/probe_vmem_limit.py on hardware before enabling
in serving (Mosaic's accounting runs ~1.4x above naive estimates and
linearity is only trusted where the probe passed).
"""

from __future__ import annotations

import os
import warnings

from jax.experimental.pallas import tpu as pltpu


def _parse_limit_mb() -> int:
    # default 64 MiB since round 4: hardware-probed (probe_vmem64.log —
    # r=16 spatial tiles and 1.18M-element temporal blocks compile) and
    # benched end-to-end (bench_vmem64.log, +0.7 fps; the v5e has 128 MiB
    # physical VMEM). VIDTOK_VMEM_LIMIT_MB=16 restores Mosaic's default.
    raw = os.environ.get("VIDTOK_VMEM_LIMIT_MB", "64") or "0"
    try:
        val = int(raw)
    except ValueError:
        warnings.warn(
            f"VIDTOK_VMEM_LIMIT_MB={raw!r} is not an integer (MiB); "
            "ignoring (using Mosaic's default 16 MiB limit)")
        return 0
    if 0 < val < 16:
        warnings.warn(
            f"VIDTOK_VMEM_LIMIT_MB={val} is below Mosaic's 16 MiB "
            "default; only raising is supported — ignoring")
        return 0
    return max(0, val)


_VMEM_MB = _parse_limit_mb()


def vmem_limit_mb() -> int:
    """The configured Mosaic scoped-VMEM limit in MiB (0 = default 16)."""
    return _VMEM_MB


def budget_scale() -> int:
    """Factor by which 16 MiB-calibrated block budgets may grow."""
    return max(1, _VMEM_MB // 16)


def mosaic_params():
    """compiler_params for pallas_call (None = Mosaic defaults)."""
    if _VMEM_MB:
        return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_MB << 20)
    return None
