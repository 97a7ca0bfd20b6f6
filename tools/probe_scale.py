"""Probe: chr1-scale single-chip capability (VERDICT r2 #1).

The reference's headline workload is hg38 with a 248 MB chr1 block
(README.md:41-44).  This measures, on the real chip, whether the
single-chip run-aware SA kernel fits and what it costs, size by size:

  for n in sizes:
    1. lower+compile `_suffix_array_runs_jit` at n, print XLA's
       memory_analysis (temp/argument/output bytes) — fits/doesn't-fit
       without risking a wedge;
    2. if it compiled and --run, execute on synthetic hg38-profile data
       (megabase N runs) and report MB/s + bit-exactness vs the native
       SA-IS on a sampled prefix check.

Run: python tools/probe_scale.py [--run] [sizes MiB...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def synth(n: int) -> np.ndarray:
    rng = np.random.default_rng(42)
    syms = np.frombuffer(b"ACGTN", np.uint8)
    s = rng.choice(syms, size=n, p=[0.29, 0.205, 0.205, 0.29, 0.01])
    for _ in range(3):
        start = int(rng.integers(0, max(1, n - n // 50)))
        s[start:start + n // 100] = ord("N")   # megabase-class N runs
    s[n - 1] = 0
    return s.astype(np.uint8)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gecoz_tpu.ops.sa_device import (_suffix_array_runs_jit,
                                         runs_ell_bits, runs_m_pad,
                                         runs_token_table)

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_run = "--run" in sys.argv
    sizes = [int(a) for a in args] or [64, 128, 248]
    dev = jax.devices()[0]
    print(f"# device: {dev}")
    syms = (0, 65, 67, 71, 78, 84)

    for mb in sizes:
        n = mb << 20
        # full round-4 accelerator set, measured from the synthetic data
        # (host pass; the same path production callers take)
        s = synth(n)
        mp = runs_m_pad(s)
        ebs = runs_ell_bits(s)
        tab = runs_token_table(s, syms, ell_bits=ebs)
        print(f"{mb} MiB: m_pad={mp/n:.3f}n ell_bits={ebs} "
              f"table={'none' if tab is None else 'yes'}", flush=True)
        t0 = time.time()
        try:
            kw = {} if tab is None else {"tok_table":
                jax.ShapeDtypeStruct(tab.shape, jnp.int32)}
            lowered = _suffix_array_runs_jit.lower(
                jax.ShapeDtypeStruct((n,), jnp.uint8), syms=syms,
                m_pad=mp, ell_bits=ebs, **kw)
            comp = lowered.compile()
            mem = comp.memory_analysis()
            print(f"{mb} MiB: compiled in {time.time() - t0:.0f}s; "
                  f"temp={mem.temp_size_in_bytes / 2**30:.2f} GiB "
                  f"args={mem.argument_size_in_bytes / 2**30:.2f} GiB "
                  f"out={mem.output_size_in_bytes / 2**30:.2f} GiB "
                  f"(= {(mem.temp_size_in_bytes + mem.output_size_in_bytes) / n:.1f} bytes/char temp+out)")
        except Exception as ex:   # noqa: BLE001
            print(f"{mb} MiB: compile FAILED {type(ex).__name__}: "
                  f"{str(ex).splitlines()[0][:300]}")
            continue
        if not do_run:
            del s
            continue
        try:
            d = jax.device_put(jnp.asarray(s), dev)
            # force the upload to finish BEFORE timing (device_put is
            # async; on the relay the stream otherwise rides the first
            # execution and pollutes the kernel number)
            int(np.asarray(d[-1]))
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                sa, bwt = (comp(d) if tab is None
                           else comp(d, tok_table=jnp.asarray(tab)))
                # block_until_ready is a no-op on the remote relay
                # backend; force completion with a scalar fetch instead
                int(np.asarray(sa[-1]))
                times.append(time.perf_counter() - t0)
            dt = min(times)
            print(f"{mb} MiB: exec times {['%.1f' % x for x in times]} s",
                  flush=True)
            sa_np = np.asarray(sa)
            # exactness spot check: suffixes at sampled SA ranks are sorted
            idx = np.sort(np.random.default_rng(0).integers(
                0, n - 1, 2000))
            piece = [s[sa_np[i]:sa_np[i] + 64].tobytes() for i in idx]
            ok = all(piece[i] <= piece[i + 1] for i in range(len(piece) - 1))
            # bwt check on a sample
            j = idx[:500]
            okb = np.array_equal(
                np.asarray(bwt)[j],
                s[(sa_np[j] - 1) % n])
            print(f"{mb} MiB: RAN in {dt:.1f}s = {n / 1e6 / dt:.1f} MB/s; "
                  f"sorted-sample={ok} bwt-sample={okb}")
            del sa, bwt, d
        except Exception as ex:   # noqa: BLE001
            print(f"{mb} MiB: run FAILED {type(ex).__name__}: "
                  f"{str(ex).splitlines()[0][:300]}")


if __name__ == "__main__":
    main()
