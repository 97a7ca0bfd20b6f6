"""Large-scale synthetic-genome validation harness.

No genomic corpora ship in this image, so this generates an hg38-shaped
synthetic genome — per-chromosome telomere/centromere N runs, Alu-like
interspersed repeats, tandem repeats, CpG-skewed base composition — and
validates the full production path at scale (the reference's de-facto
validation is an hg38 round trip, README.md:31-36):

  fasta -> .gcz/.gcx -> fasta   bit-exact per header
  count/search spot checks vs naive scans of the source
  range extraction across N-run boundaries
  --check integrity verification

Usage: python -m gecoz_tpu.tools.validate_scale [total_MB] [out_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np


def synth_chromosome(rng: np.random.Generator, n: int) -> np.ndarray:
    """One chromosome: telomeric/centromeric N runs + repeats + unique."""
    out = np.empty(n, dtype=np.uint8)
    syms = np.frombuffer(b"ACGT", np.uint8)
    out[:] = rng.choice(syms, size=n, p=[0.295, 0.205, 0.205, 0.295])

    # telomeres: N runs at both ends (0.1-1% each)
    tel = max(100, int(n * rng.uniform(0.001, 0.01)))
    out[:tel] = ord("N")
    out[n - tel:] = ord("N")
    # centromere: one large N run near the middle
    cen = max(1000, int(n * rng.uniform(0.01, 0.03)))
    mid = n // 2 + int(rng.integers(-n // 10, n // 10))
    out[mid:mid + cen] = ord("N")

    # Alu-like interspersed repeat: one ~300bp unit pasted with small
    # mutations over ~10% of the chromosome
    alu = rng.choice(syms, size=300)
    n_copies = max(1, int(n * 0.1) // 300)
    starts = rng.integers(tel, n - tel - 301, size=n_copies)
    for s in starts:
        unit = alu.copy()
        nmut = rng.poisson(9)
        if nmut:
            pos = rng.integers(0, 300, size=nmut)
            unit[pos] = rng.choice(syms, size=nmut)
        out[s:s + 300] = unit

    # a few tandem repeats (microsatellite-like)
    for _ in range(max(1, n // (1 << 21))):
        motif = rng.choice(syms, size=int(rng.integers(2, 7)))
        reps = int(rng.integers(50, 400))
        tr = np.tile(motif, reps)
        s = int(rng.integers(tel, max(tel + 1, n - tel - len(tr))))
        out[s:s + len(tr)] = tr[:max(0, min(len(tr), n - s))]
    return out


def write_fasta(path: Path, chroms: dict[str, np.ndarray]) -> None:
    with open(path, "wb") as f:
        for name, seq in chroms.items():
            f.write(b">" + name.encode() + b"\n")
            for i in range(0, len(seq), 60):
                f.write(seq[i:i + 60].tobytes() + b"\n")


def read_fasta(path: Path) -> dict[str, bytes]:
    out: dict[str, list[bytes]] = {}
    name = None
    for line in open(path, "rb"):
        line = line.rstrip(b"\r\n")
        if line.startswith(b">"):
            name = line[1:].decode()
            out[name] = []
        elif name is not None:
            out[name].append(line)
    return {k: b"".join(v) for k, v in out.items()}


def main() -> int:
    total_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    outdir = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("/tmp/gcz_scale")
    outdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(2024)

    # chromosome size spectrum roughly hg38-shaped (largest ~12.5% of total)
    total = total_mb << 20
    sizes = []
    remaining = total
    frac = 0.125
    while remaining > (1 << 20) and len(sizes) < 24:
        sz = max(1 << 20, int(total * frac))
        sz = min(sz, remaining)
        sizes.append(sz)
        remaining -= sz
        frac *= 0.82
    if remaining > 0:
        sizes.append(remaining)

    print(f"generating {len(sizes)} chromosomes, {total >> 20} MiB total")
    chroms = {}
    for i, sz in enumerate(sizes):
        chroms[f"chr{i + 1}"] = synth_chromosome(rng, sz)
    fa = outdir / "genome.fa"
    t0 = time.perf_counter()
    write_fasta(fa, chroms)
    print(f"wrote {fa} in {time.perf_counter() - t0:.1f}s")

    from gecoz_tpu.tools import driver

    gcz = outdir / "genome.gcz"
    t0 = time.perf_counter()
    driver.index_fasta(str(fa), str(gcz))
    dt = time.perf_counter() - t0
    csize = gcz.stat().st_size + gcz.with_suffix(".gcx").stat().st_size
    print(f"indexed in {dt:.1f}s ({total / dt / 1e6:.1f} MB/s host), "
          f"{csize >> 20} MiB compressed ({8 * csize / total:.3f} bit/sym)")

    back = outdir / "back.fa"
    t0 = time.perf_counter()
    driver.decompress(str(gcz), str(back))
    print(f"decompressed in {time.perf_counter() - t0:.1f}s")

    got = read_fasta(back)
    ok = True
    for name, seq in chroms.items():
        if got.get(name, b"") != seq.tobytes():
            print(f"MISMATCH {name}")
            ok = False
    print("round trip:", "OK" if ok else "FAILED")

    # count spot checks vs the source
    hay = {k: v.tobytes() for k, v in chroms.items()}
    for plen in (12, 20, 40):
        src = chroms["chr1"]
        s = int(rng.integers(0, len(src) - plen))
        pat = src[s:s + plen].tobytes()
        if b"N" in pat or b"\0" in pat:
            continue
        want = sum(h.count(pat) for h in hay.values())
        # overlapping occurrences: recount with find
        want = 0
        for h in hay.values():
            at = h.find(pat)
            while at >= 0:
                want += 1
                at = h.find(pat, at + 1)
        import io
        t0 = time.perf_counter()
        n_hits = driver.match(str(gcz), None, pat.decode(), False,
                              out=io.StringIO())
        dt = time.perf_counter() - t0
        status = "OK" if n_hits == want else f"FAIL want {want}"
        print(f"count {plen}-mer: {n_hits} ({dt * 1e3:.0f} ms) {status}")
        if n_hits != want:
            ok = False

    # ranged extraction across an N boundary
    src = chroms["chr2"]
    npos = int(np.flatnonzero(src == ord("N"))[0])
    lo = max(0, npos - 30)
    seqf = outdir / "range.seq"
    driver.extract_range(str(gcz), "chr2", lo, lo + 60, str(seqf))
    text = open(seqf, "rb").read()
    if text != src[lo:lo + 60].tobytes():
        print("range extract FAILED")
        ok = False
    else:
        print("range extract OK")

    check_ok = driver.check(str(gcz), deep=False)
    print("--check:", "OK" if check_ok else "FAILED")
    return 0 if ok and check_ok else 1


if __name__ == "__main__":
    sys.exit(main())
