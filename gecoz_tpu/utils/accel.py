"""Accelerator availability probe shared by the auto-backend dispatchers.

The `auto` backend puts the TPU in the flagship path: encode/decode use the
device tier whenever a *functioning* non-CPU accelerator is attached and
the work is large enough to amortize dispatch.  The probe runs a trivial
jit in a subprocess with a timeout because a wedged remote-TPU relay (seen
in some environments) hangs arbitrary JAX calls — a hung probe must never
hang the pipeline.  The result is cached for the process lifetime.

Env overrides:
  GECOZ_ACCEL=1 / 0   force the probe result (skips the subprocess).
"""

from __future__ import annotations

import os
import subprocess
import sys

_CACHED: bool | None = None

# Below this many bytes of work the device tier loses to dispatch latency.
# Break-even from BENCH_r02 numbers: relay RTT ~30 ms equals ~130 KiB of
# native-tier work (4.4 MB/s), and the device beats the native tier 6.6x
# already at 4 MiB; with the persistent compilation cache (gecoz_tpu
# __init__) warm, compile cost no longer factors in.  512 KiB leaves
# headroom for relay jitter.  Override with GECOZ_DEVICE_MIN_BYTES.
DEVICE_MIN_BYTES = int(os.environ.get("GECOZ_DEVICE_MIN_BYTES", 512 << 10))

_PROBE_CODE = (
    "import jax, jax.numpy as jnp;"
    "d = jax.devices()[0];"
    "assert d.platform != 'cpu', 'cpu-only';"
    "print(int(jax.jit(lambda a: (a * 2).sum())(jnp.arange(8))))"
)


def accelerator_ok(timeout_s: int = 120, attempts: int = 2,
                   _refresh: bool = False) -> bool:
    """True if the default JAX backend is a responsive non-CPU device."""
    global _CACHED
    env = os.environ.get("GECOZ_ACCEL")
    if env is not None:
        return env not in ("0", "", "false")
    if _CACHED is not None and not _refresh:
        return _CACHED
    ok = False
    for _ in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", _PROBE_CODE],
                               timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                ok = True
                break
        except subprocess.TimeoutExpired:
            pass
    _CACHED = ok
    return ok


def device_worthwhile(nbytes: int) -> bool:
    """Work is big enough that the device tier beats dispatch latency."""
    return nbytes >= DEVICE_MIN_BYTES


# Measured single-chip SA working set: the 248 MB hg38 chr1 block peaked at
# 11.1 GiB of HBM through the device suffix sort (artifacts/
# SCALE_r3_device_sa.log) — ~48 bytes per input byte (sort operands,
# rerank keys and their double buffers).
SA_DEVICE_BYTES_PER_CHAR = 48


def device_hbm_bytes() -> int | None:
    """Usable accelerator memory per device, or None when unknown.

    Queried from the live backend (memory_stats when exposed); the
    GECOZ_HBM_BYTES env var overrides (also the test hook for exercising
    the sharded-dispatch path on CPU meshes)."""
    env = os.environ.get("GECOZ_HBM_BYTES")
    if env:
        return int(env)
    try:
        import jax
        d = jax.devices()[0]
        if d.platform == "cpu":
            return None                     # host RAM: not the constraint
        stats = d.memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if limit:
            return int(limit)
    except Exception:                        # noqa: BLE001 — probe only
        pass
    return None


def needs_sharded_sa(nbytes: int) -> bool:
    """True when one block's device suffix sort cannot fit a single
    device's HBM and must take the sharded kernel
    (gecoz_tpu.parallel.sharded_sa) across the mesh."""
    budget = device_hbm_bytes()
    if budget is None:
        return False
    return nbytes * SA_DEVICE_BYTES_PER_CHAR > budget
