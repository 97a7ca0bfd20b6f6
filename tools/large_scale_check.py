#!/usr/bin/env python
"""hg38-scale validation: chr1-sized synthetic round trip through the CLI.

Mirrors the reference's headline workload (README.md:31-44: full hg38
indexed with blocks capped at chr1's 248 MB) with synthetic DNA, since no
genomic corpora exist in this image.  Builds a FASTA with one 248 MB
sequence plus smaller ones (exercising the GecoIndex.java:72-85 merge
policy at scale), then drives:

    index -> .gcz/.gcx -> decompress -> per-header md5 compare -> count

Usage: python tools/large_scale_check.py [chr1_mb] [workdir]
"""

from __future__ import annotations

import hashlib
import subprocess
import sys
import time
from pathlib import Path

import numpy as np


def synth_seq(n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    syms = np.frombuffer(b"ACGTN", np.uint8)
    out = rng.choice(syms, size=n, p=[0.29, 0.205, 0.205, 0.29, 0.01])
    # megabase-scale N runs like real centromeres/telomeres
    for _ in range(3):
        start = int(rng.integers(0, max(1, n - n // 50)))
        out[start:start + n // 100] = ord("N")
    return out.astype(np.uint8)


def write_fasta(path: Path, seqs: dict[str, np.ndarray]) -> None:
    with open(path, "wb", buffering=1 << 22) as f:
        for name, s in seqs.items():
            f.write(b">" + name.encode() + b"\n")
            # reflow to 60-char lines without a python loop
            n = len(s)
            rows = -(-n // 60)
            buf = np.full((rows, 61), ord("\n"), np.uint8)
            pad = rows * 60 - n
            flat = np.concatenate([s, np.zeros(pad, np.uint8)])
            buf[:, :60] = flat.reshape(rows, 60)
            raw = buf.tobytes()
            if pad:
                # drop the padding NULs from the final row
                raw = raw[: -(pad + 1)] + b"\n"
            f.write(raw)


def md5s_of_fasta(path: Path) -> dict[str, str]:
    out: dict[str, str] = {}
    cur, h = None, None
    with open(path, "rb", buffering=1 << 22) as f:
        for line in f:
            if line.startswith(b">"):
                if cur is not None:
                    out[cur] = h.hexdigest()
                cur = line[1:].split()[0].decode()
                h = hashlib.md5()
            else:
                h.update(line.rstrip(b"\r\n"))
    if cur is not None:
        out[cur] = h.hexdigest()
    return out


def run(cmd: list[str]) -> float:
    t0 = time.perf_counter()
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)
    return time.perf_counter() - t0


def main() -> None:
    chr1_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 248
    work = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("/tmp/gecoz_large")
    work.mkdir(parents=True, exist_ok=True)
    fa = work / "genome.fa"
    gcz = work / "genome.gcz"
    back = work / "back.fa"

    sizes = {
        "chr1": chr1_mb << 20,
        "chr9": int(chr1_mb * 0.56) << 20,
        "chr17": int(chr1_mb * 0.33) << 20,
        "chr21": int(chr1_mb * 0.19) << 20,
        "chrM": 16_569,
    }
    t0 = time.perf_counter()
    seqs = {k: synth_seq(n, seed=i) for i, (k, n) in enumerate(sizes.items())}
    write_fasta(fa, seqs)
    print(f"fasta: {fa.stat().st_size / 1e6:.0f} MB in "
          f"{time.perf_counter() - t0:.0f}s", flush=True)
    want = {k: hashlib.md5(v.tobytes()).hexdigest() for k, v in seqs.items()}
    total = sum(sizes.values())
    pattern = bytes(seqs["chr1"][1000:1024])
    del seqs

    py = sys.executable
    t_idx = run([py, "-m", "gecoz_tpu.cli", "-i", str(fa), "-o", str(gcz),
                 "-t", "2", "-v", "INFO"])
    gcx = gcz.with_suffix(".gcx")
    print(f"INDEX {total / 1e6 / t_idx:.1f} MB/s | .gcz "
          f"{gcz.stat().st_size / 1e6:.0f} MB + .gcx "
          f"{gcx.stat().st_size / 1e6:.0f} MB "
          f"({(gcz.stat().st_size) * 8 / total:.3f} bit/sym)", flush=True)

    t_dec = run([py, "-m", "gecoz_tpu.cli", "-i", str(gcz), "-o", str(back)])
    print(f"DECODE {total / 1e6 / t_dec:.1f} MB/s", flush=True)

    got = md5s_of_fasta(back)
    assert got == want, {k: (want.get(k), got.get(k))
                         for k in set(want) | set(got)
                         if want.get(k) != got.get(k)}
    print("round trip OK (per-header md5 equal)", flush=True)

    t_cnt = run([py, "-m", "gecoz_tpu.cli", "-i", str(gcz), "-c",
                 pattern.decode()])
    print(f"COUNT in {t_cnt:.1f}s", flush=True)
    print("LARGE-SCALE CHECK PASSED", flush=True)


if __name__ == "__main__":
    main()
