"""Multi-process (jax.distributed) smoke test on the CPU backend.

Two real processes coordinate through a local rendezvous: each encodes
its shard of the block plan (DistributedContext.my_blocks) and the
results are gathered in header order — the single-container stand-in for
the multi-host DCN gather described in parallel/mesh.py.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

_WORKER = r"""
import os, sys, pickle
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

rank = int(sys.argv[1])
nprocs = int(sys.argv[2])
outdir = sys.argv[3]
port = sys.argv[4]

jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=rank)
assert jax.process_count() == nprocs

import numpy as np
from gecoz_tpu.parallel.mesh import DistributedContext, encode_blocks

rng = np.random.default_rng(0)   # same plan on every process
blocks = []
headers = []
for i in range(5):
    n = int(rng.integers(200, 2000))
    data = rng.choice(np.frombuffer(b"ACGT\0", np.uint8), size=n)
    data[-1] = 0
    blocks.append(data)
    headers.append([f"s{i}"])

ctx = DistributedContext(jax.process_index(), jax.process_count())
mine = ctx.my_blocks([len(b) for b in blocks])
enc = encode_blocks([blocks[i] for i in mine], [headers[i] for i in mine])
with open(os.path.join(outdir, f"shard{rank}.pkl"), "wb") as f:
    pickle.dump({i: e for i, e in zip(mine, enc)}, f)
print("worker", rank, "encoded", mine)
"""


@pytest.mark.slow
def test_two_process_distributed_encode(tmp_path):
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    w = tmp_path / "worker.py"
    w.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    procs = [subprocess.Popen(
        [sys.executable, str(w), str(rank), "2", str(tmp_path), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for rank in (0, 1)]
    outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o

    import pickle
    merged = {}
    for rank in (0, 1):
        with open(tmp_path / f"shard{rank}.pkl", "rb") as f:
            merged.update(pickle.load(f))
    assert sorted(merged) == [0, 1, 2, 3, 4]

    # gathered result equals a local sequential encode
    from gecoz_tpu.formats.gcz import encode_block
    rng = np.random.default_rng(0)
    for i in range(5):
        n = int(rng.integers(200, 2000))
        data = rng.choice(np.frombuffer(b"ACGT\0", np.uint8), size=n)
        data[-1] = 0
        gcz, gcx = encode_block(data, [f"s{i}"], backend="numpy")
        assert merged[i] == (gcz, gcx), i


_WORKER2 = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
rank = int(sys.argv[1]); nprocs = int(sys.argv[2])
fa = sys.argv[3]; out = sys.argv[4]; port = sys.argv[5]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=rank)
from gecoz_tpu.parallel.mesh import index_fasta_parallel
index_fasta_parallel(fa, out)
print("rank", rank, "done")
"""


@pytest.mark.slow
def test_two_process_parallel_file_write(tmp_path):
    import socket
    from test_gcz_files import write_fasta
    from gecoz_tpu.tools import driver

    rng2 = np.random.default_rng(7)
    records = [(f"chr{i}",
                rng2.choice(np.frombuffer(b"ACGT", np.uint8),
                            size=int(rng2.integers(300, 2500))))
               for i in range(5)]
    fa = tmp_path / "in.fa"
    write_fasta(fa, records)
    seq = tmp_path / "seq.gcz"
    driver.index_fasta(fa, seq)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    w = tmp_path / "worker2.py"
    w.write_text(_WORKER2)
    env = dict(os.environ)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    out = tmp_path / "par.gcz"
    procs = [subprocess.Popen(
        [sys.executable, str(w), str(rank), "2", str(fa), str(out), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for rank in (0, 1)]
    outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o
    assert out.read_bytes() == seq.read_bytes()
    assert (tmp_path / "par.gcx").read_bytes() ==         (tmp_path / "seq.gcx").read_bytes()
