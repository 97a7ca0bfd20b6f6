"""Probe: which 2D gather forms Mosaic lowers (feeds the Pallas LF-walk
kernel design — 1D jnp.take is NotImplemented, '2D gather' is the
supported family; this finds the usable spellings and their cost).

Run on the real chip: python tools/probe_gather2d.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"# device: {jax.devices()[0]}")
    R, B = 256, 128
    rng = np.random.default_rng(0)
    T2 = jnp.asarray(rng.integers(0, 1 << 20, (R, 128)).astype(np.int32))
    r = rng.integers(0, R, B).astype(np.int32)
    c = rng.integers(0, 128, B).astype(np.int32)
    T2n = np.asarray(T2)

    def try_kernel(name, kern, out_shape, *args):
        try:
            out = pl.pallas_call(
                kern, out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(*args)
            return np.asarray(out)
        except Exception as ex:   # noqa: BLE001
            print(f"{name}: FAILED {type(ex).__name__}: "
                  f"{(str(ex).splitlines() or [repr(ex)])[0][:160]}")
            return None

    # (a) row gather: out[i, :] = T2[r[i], :] via jnp.take axis=0
    def k_a(t_ref, r_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], r_ref[:], axis=0)
    o = try_kernel("take axis=0 (rows)", k_a,
                   jax.ShapeDtypeStruct((B, 128), jnp.int32),
                   T2, jnp.asarray(r))
    if o is not None:
        print("rows gather correct:", np.array_equal(o, T2n[r]))

    # (b) lane gather: out[i, 0] = A[i, c[i]] via take_along_axis axis=1
    A = jnp.asarray(rng.integers(0, 99, (B, 128)).astype(np.int32))
    def k_b(a_ref, c_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(a_ref[:], c_ref[:].reshape(B, 1),
                                       axis=1)
    o = try_kernel("take_along_axis axis=1", k_b,
                   jax.ShapeDtypeStruct((B, 1), jnp.int32),
                   A, jnp.asarray(c))
    if o is not None:
        print("lane gather correct:",
              np.array_equal(o[:, 0], np.asarray(A)[np.arange(B), c]))

    # (c) per-lane row gather: out[i, l] = T2[r2[i, l], l]
    r2 = rng.integers(0, R, (B, 128)).astype(np.int32)
    def k_c(t_ref, r_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], r_ref[:], axis=0)
    o = try_kernel("take_along_axis axis=0", k_c,
                   jax.ShapeDtypeStruct((B, 128), jnp.int32),
                   T2, jnp.asarray(r2))
    if o is not None:
        print("per-lane row gather correct:",
              np.array_equal(o, np.take_along_axis(T2n, r2, axis=0)))

    # (d) timing at kernel scale: 2048 walks x 32 steps of row gather +
    # lane pick over a 2Mi-row table reshaped [n/128, 128]
    n = 2 << 20
    tab = jnp.asarray(rng.integers(0, n << 8, n).astype(np.int32)
                      ).reshape(n // 128, 128)
    Wn = 2048
    seeds = jnp.asarray(rng.integers(0, n, Wn).astype(np.int32))

    def k_walk(t_ref, s_ref, o_ref):
        idx = s_ref[:]
        t = t_ref[:]
        for j in range(32):
            rows = jnp.take(t, idx >> 7, axis=0)          # [Wn,128]
            v = jnp.take_along_axis(
                rows, (idx & 127).reshape(Wn, 1), axis=1)[:, 0]
            o_ref[j, :] = v
            idx = v >> 8
    try:
        t0 = time.time()
        f = jax.jit(lambda t, s: pl.pallas_call(
            k_walk,
            out_shape=jax.ShapeDtypeStruct((32, Wn), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(t, s))
        out = jax.block_until_ready(f(tab, seeds))
        compile_t = time.time() - t0
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(tab, seeds))
            best = min(best, time.perf_counter() - t0)
        per = best / (Wn * 32) * 1e9
        print(f"walk kernel: compile {compile_t:.0f}s, best {best*1e3:.2f} ms"
              f" = {per:.1f} ns/step-walk ({Wn} walks x 32 steps)")
    except Exception as ex:   # noqa: BLE001
        print(f"walk kernel FAILED {type(ex).__name__}: "
              f"{str(ex).splitlines()[0][:300]}")


if __name__ == "__main__":
    main()
