"""gecotools-compatible command line interface.

Flag-compatible with the reference CLI (nova-gecoz tools/Gecotools.java:49-244):

    gecoz -i file [-o out [header [from [to]]]] [-c [header] PATTERN]
          [-s [header] PATTERN | -s query.fa] [-t N] [-v LEVEL]
          [-idx path.gcx] [--backend auto|numpy|device|native]

Examples (mirroring Gecotools.java:51-68):
    gecoz -i hg38.fa  -o hg38.gcz
    gecoz -i hg38.gcz -o hg38.fasta
    gecoz -i hg38.gcz -o chr15.seq chr15
    gecoz -i hg38.gcz -c ATTAACCCATGAAAA
    gecoz -i hg38.gcz -s chr11 ATTAACCCATGAAAA
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

HELP = __doc__


def _retune_malloc(argv: list[str]) -> None:
    """Re-exec once with glibc malloc tuned for heap reuse.

    Hosts with on-demand-faulted VM memory serve fresh private pages
    extremely slowly; keeping large buffers in the reusable heap (instead
    of fresh mmaps trimmed back to the OS) makes steady-state encode an
    order of magnitude faster.  Harmless elsewhere.  Opt out with
    GECOZ_NO_MALLOC_TUNING=1.
    """
    import os
    if os.environ.get("GECOZ_NO_MALLOC_TUNING") or \
            os.environ.get("MALLOC_MMAP_THRESHOLD_"):
        return
    env = dict(os.environ)
    env["MALLOC_MMAP_THRESHOLD_"] = str(1 << 34)
    env["MALLOC_TRIM_THRESHOLD_"] = str(1 << 34)
    try:
        os.execve(sys.executable,
                  [sys.executable, "-m", "gecoz_tpu.cli"] + argv, env)
    except OSError:
        pass


def parse_args(argv: list[str]) -> dict[str, list[str]]:
    """Multimap parser (Gecotools.parameters:209-243)."""
    known = {"-h", "--help", "-i", "--input", "-idx", "--index", "-s",
             "--search", "-c", "--count", "-a", "--align", "-t", "--threads",
             "-v", "--verbose", "-o", "--output", "--backend", "--resume",
             "--sampling", "--check", "--deep"}
    params: dict[str, list[str]] = {}
    values = None
    for arg in argv:
        if arg in known:
            values = params.setdefault(arg, [])
        elif values is not None:
            values.append(arg)
    return params


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    params = parse_args(argv)

    if not params or "-h" in params or "--help" in params:
        print(HELP)
        return 0

    level = (params.get("-v") or params.get("--verbose") or ["WARNING"])
    name = (level[0].upper() if level else "WARNING")
    # accept java.util.logging level names (Gecotools.java -v contract)
    java_levels = {"SEVERE": "ERROR", "FINE": "DEBUG", "FINER": "DEBUG",
                   "FINEST": "DEBUG", "ALL": "DEBUG", "OFF": "CRITICAL",
                   "CONFIG": "INFO"}
    name = java_levels.get(name, name)
    logging.basicConfig(
        level=getattr(logging, name, logging.WARNING),
        format="%(message)s")

    inp = params.get("-i") or params.get("--input")
    if not inp:
        print("no input file specified", file=sys.stderr)
        return 1
    ipath = Path(inp[0])
    if not ipath.is_file():
        print(f"no input file found: {ipath}", file=sys.stderr)
        return 1
    backend = (params.get("--backend") or ["auto"])[0]
    tvals = params.get("-t") or params.get("--threads") or []
    threads = int(tvals[0]) if tvals else 1
    svals = params.get("--sampling") or []
    sampling = int(svals[0]) if svals else 32

    from gecoz_tpu.formats.gcz import check_format
    from gecoz_tpu.tools import driver

    if "--check" in params:
        ok = driver.check(ipath, deep="--deep" in params)
        return 0 if ok else 1
    if "-o" in params or "--output" in params:
        out = params.get("-o") or params.get("--output")
        if not out:
            print("no output file specified.", file=sys.stderr)
            return 1
        opath = Path(out[0])
        if check_format(ipath):
            if len(out) > 1:
                start = int(out[2]) if len(out) > 2 else 0
                end = int(out[3]) if len(out) > 3 else None
                driver.extract_range(ipath, out[1], start, end, opath)
            else:
                driver.decompress(ipath, opath, backend=backend,
                                  threads=threads)
        else:
            idx = params.get("-idx") or params.get("--index")
            xpath = Path(idx[0]) if idx else None
            driver.index_fasta(ipath, opath, xpath, sampling=sampling,
                               backend=backend, threads=threads,
                               resume="--resume" in params)
    elif "-s" in params or "--search" in params:
        search = params.get("-s") or params.get("--search")
        if not search:
            print("no search string/filename specified.", file=sys.stderr)
            return 1
        if len(search) == 1 and Path(search[0]).is_file():
            driver.gff_search(ipath, Path(search[0]), backend=backend)
        else:
            header = search[0] if len(search) > 1 else None
            pattern = search[1] if len(search) > 1 else search[0]
            driver.match(ipath, header, pattern, show_positions=True)
    elif "-c" in params or "--count" in params:
        count = params.get("-c") or params.get("--count")
        if not count:
            print("no search string specified.", file=sys.stderr)
            return 1
        header = count[0] if len(count) > 1 else None
        pattern = count[1] if len(count) > 1 else count[0]
        driver.match(ipath, header, pattern, show_positions=False)
    return 0


if __name__ == "__main__":
    _retune_malloc(sys.argv[1:])   # re-exec only as a real CLI process
    sys.exit(main())
