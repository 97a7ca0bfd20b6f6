"""Probe: Pallas streaming-scan kernel vs XLA scans on the real chip.

Validates correctness on-chip and times cumsum/cummax/reverse-cummin at
4 Mi and 64 Mi against jnp.cumsum / lax.cummax / lax.cummin — the scans
the SA kernels call ~20x per block.

Run: python tools/probe_scan.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp
    from gecoz_tpu.ops import scan_pallas as sp

    print(f"# device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)

    def timeit(f, *a, repeat=5):
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    for n in (1 << 22, 1 << 26):
        x = rng.integers(-1000000, 1000000, n).astype(np.int32)
        d = jax.device_put(jnp.asarray(x))
        pairs = [
            ("cumsum", sp.cumsum_i32,
             jax.jit(lambda v: jnp.cumsum(v)), np.cumsum(x).astype(np.int32)),
            ("cummax", sp.cummax_i32,
             jax.jit(lambda v: jax.lax.cummax(v)), np.maximum.accumulate(x)),
            ("cummin_rev", sp.cummin_rev_i32,
             jax.jit(lambda v: jax.lax.cummin(v, reverse=True)),
             np.minimum.accumulate(x[::-1])[::-1]),
        ]
        for name, pallas_fn, xla_fn, want in pairs:
            pf = jax.jit(pallas_fn)
            try:
                got = np.asarray(pf(d))
                ok = np.array_equal(got, want)
                tp = timeit(pf, d)
                tx = timeit(xla_fn, d)
                print(f"{name} {n >> 20}Mi: pallas {tp * 1e3:.2f} ms vs "
                      f"xla {tx * 1e3:.2f} ms ({tx / tp:.1f}x) correct={ok}")
            except Exception as ex:   # noqa: BLE001
                print(f"{name} {n >> 20}Mi: FAILED {type(ex).__name__}: "
                      f"{(str(ex).splitlines() or [repr(ex)])[0][:200]}")


if __name__ == "__main__":
    main()
