"""Probe: round-4b SA kernel changes on the real chip.

Validates the new Pallas scan extensions (reverse-grid scan, op "last"
segmented fill — ops/scan_pallas.py) bit-exactly against the jnp
fallbacks ON-CHIP, then times the run-aware SA kernel at 4/64 Mi across
the levers this round added:

  * single-pass fill_rev seed + single-pass fill_fwd nr broadcast
    (replaces 3-pass flip-cummin-flip + ceil(bits/cb) chunked cummaxes)
  * first doubling round width r1_keys in {3, 6} — 6 orders 24 tokens
    deep (p=4), past the ~21-token distinctness depth of the 64 MiB
    bench block, so the second (sort + rerank) round is skipped

Run:  python tools/probe_fill.py [max_mi]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _sync(out):
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    return int(np.asarray(leaves[0].ravel()[:1])[0])


def timeit(fn, *args, repeat=3):
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gecoz_tpu.ops import scan_pallas as sp

    max_mi = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    print(f"# device: {jax.devices()[0]}", flush=True)

    # 1. on-chip correctness of the new scan modes vs jnp fallbacks
    rng = np.random.default_rng(3)
    n = 3 * sp._C + 12345
    x = np.full(n, -1, np.int32)
    marks = rng.choice(n, size=n // 50, replace=False)
    x[marks] = rng.integers(0, 1 << 30, size=marks.size).astype(np.int32)
    xd = jnp.asarray(x)
    got_f = np.asarray(sp._scan_pallas(xd, "last"))
    got_r = np.asarray(sp._scan_pallas(xd, "last", reverse=True))
    ref_f = np.asarray(sp._fill_fallback(xd, reverse=False))
    ref_r = np.asarray(sp._fill_fallback(xd, reverse=True))
    print(f"# fill_fwd on-chip exact: {np.array_equal(got_f, ref_f)}",
          flush=True)
    print(f"# fill_rev on-chip exact: {np.array_equal(got_r, ref_r)}",
          flush=True)
    y = rng.integers(-10**9, 10**9, size=n).astype(np.int32)
    got_m = np.asarray(sp._scan_pallas(jnp.asarray(y), "min", reverse=True))
    ref_m = np.minimum.accumulate(y[::-1])[::-1]
    print(f"# rev-cummin on-chip exact: {np.array_equal(got_m, ref_m)}",
          flush=True)
    if not (np.array_equal(got_f, ref_f) and np.array_equal(got_r, ref_r)
            and np.array_equal(got_m, ref_m)):
        print("ON-CHIP MISMATCH — do not ship", flush=True)
        return

    from bench import synth_dna
    from gecoz_tpu.ops.sa_device import _suffix_array_runs_jit

    for mi in (4, 64):
        if mi > max_mi:
            break
        nn = mi << 20
        data = synth_dna(nn, seed=11)
        d = jax.device_put(jnp.asarray(data))
        syms = tuple(int(v) for v in np.unique(data))

        ref_sa = None
        for r1 in (3, 6):
            fn = jax.jit(lambda s, r1=r1: _suffix_array_runs_jit(
                s, syms=syms, r1_keys=r1)[0])
            t0 = time.perf_counter()
            sa0 = fn(d)
            _sync(sa0)
            print(f"[{mi}Mi] r1_keys={r1} compile+run "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
            if ref_sa is None:
                ref_sa = np.asarray(sa0)
                # spot-check correctness once per size
                idx = np.sort(ref_sa[:: max(1, nn // 4096)])
                ok = np.array_equal(np.sort(ref_sa), np.arange(nn))
                print(f"[{mi}Mi] SA is a permutation: {ok}", flush=True)
                del idx
            else:
                same = np.array_equal(np.asarray(sa0), ref_sa)
                print(f"[{mi}Mi] r1_keys={r1} matches r1_keys=3: {same}",
                      flush=True)
            t = timeit(fn, d)
            print(f"[{mi}Mi] SA(runs, r1={r1}) {t*1e3:.0f} ms -> "
                  f"{nn/1e6/t:.1f} MB/s", flush=True)
            del sa0

        from gecoz_tpu.ops.pipeline import index_block
        ib = jax.jit(index_block)
        t0 = time.perf_counter()
        _sync(ib(d))
        print(f"[{mi}Mi] index compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)
        t_ib = timeit(ib, d)
        print(f"[{mi}Mi] index_block {t_ib*1e3:.0f} ms -> "
              f"{nn/1e6/t_ib:.1f} MB/s", flush=True)
        del d
    print("done", flush=True)


if __name__ == "__main__":
    main()
