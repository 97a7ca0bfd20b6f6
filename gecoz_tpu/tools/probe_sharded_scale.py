"""Capacity-scale run of the sharded suffix sort (VERDICT r4 item 3).

Runs `parallel.sharded_sa.suffix_array_sharded` on the 8-virtual-device
CPU mesh at a block size whose single-chip working set GENUINELY exceeds
one v5e's HBM (measured ~46-48 B/char, artifacts/SCALE_r4_device_sa.log;
v5e bytes_limit is ~16 GiB), i.e. the regime the module exists for — the
capacity axis the reference bounds with its merge-cap policy
(README.md:41-44) and the int32-SA contract (SAIS.java:103).

Asserts bit-exactness against the native SA-IS oracle and reports the
observed peak host memory during the sharded phase (the CPU-mesh proxy
for the ~8n/D-per-device claim: all 8 virtual devices share this
process, so peak-RSS-delta / D bounds the per-device footprint).

Usage: python -m gecoz_tpu.tools.probe_sharded_scale [--mb 352]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


class PeakTracker(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.peak = _rss_mb()
        self._halt = threading.Event()

    def run(self):
        while not self._halt.is_set():
            self.peak = max(self.peak, _rss_mb())
            time.sleep(0.25)

    def stop(self) -> float:
        self._halt.set()
        self.join()
        return max(self.peak, _rss_mb())


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=352)
    a = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    D = len(jax.devices())
    n = a.mb << 20
    print(f"devices: {D} ({jax.devices()[0].platform}), n = {a.mb} MiB "
          f"({n} chars)", flush=True)
    print(f"single-chip SA working set at this size: ~{48 * n / 2**30:.1f} "
          "GiB at the measured 48 B/char (SCALE_r4_device_sa.log: 46 B/char"
          " at 248 MiB) vs ~16 GiB v5e HBM -> needs_sharded_sa is genuine, "
          "no GECOZ_HBM_BYTES override involved", flush=True)

    from gecoz_tpu.tools.validate_scale import synth_seq
    rng = np.random.default_rng(52)
    t0 = time.perf_counter()
    s = synth_seq(rng, n)
    s[-1] = 0                                   # terminated block
    print(f"synthesized in {time.perf_counter() - t0:.1f}s; "
          f"baseline RSS {_rss_mb():.0f} MB", flush=True)

    from gecoz_tpu.ops.sa_device import max_run_length
    mrl = int(max_run_length(s))
    print(f"longest equal-symbol run: {mrl} -> impl=auto picks "
          f"{'runs' if mrl > 64 else 'kmer'}", flush=True)

    from gecoz_tpu.parallel.sharded_sa import suffix_array_sharded
    base = _rss_mb()
    tracker = PeakTracker()
    tracker.start()
    t0 = time.perf_counter()
    sa_d, bwt_d = suffix_array_sharded(s)
    sa = np.asarray(sa_d).astype(np.int64)
    bwt = np.asarray(bwt_d)
    wall = time.perf_counter() - t0
    peak = tracker.stop()
    del sa_d, bwt_d
    print(f"sharded SA: {wall:.1f}s = {n / 1e6 / wall:.2f} MB/s "
          f"(compile included; 2-core host CPU mesh — a throughput FLOOR, "
          f"not a TPU number)", flush=True)
    used = peak - base
    print(f"peak RSS during sharded phase: {peak:.0f} MB "
          f"(delta {used:.0f} MB = {used * 2**20 / n:.1f} B/char total "
          f"across all {D} virtual devices = {used * 2**20 / n / D:.2f} "
          f"B/char/device-share; claim ~8 B/char/device -> "
          f"{8 * n / 2**20:.0f} MB total)", flush=True)

    # oracle: native SA-IS (independent algorithm, C++)
    from gecoz_tpu.ops.sa import bwt_from_sa, suffix_array
    t0 = time.perf_counter()
    ref_sa = suffix_array(s, backend="native").astype(np.int64)
    ref_bwt = bwt_from_sa(s, ref_sa)
    print(f"native SA-IS oracle: {time.perf_counter() - t0:.1f}s", flush=True)

    ok_sa = np.array_equal(sa, ref_sa)
    ok_bwt = np.array_equal(bwt, ref_bwt)
    print(f"SA bit-exact: {ok_sa}; BWT bit-exact: {ok_bwt}", flush=True)
    print("SHARDED-SCALE", "PASSED" if ok_sa and ok_bwt else "FAILED",
          flush=True)
    return 0 if ok_sa and ok_bwt else 1


if __name__ == "__main__":
    sys.exit(main())
