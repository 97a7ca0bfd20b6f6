"""Batched multi-pattern search vs the scalar host engine + GFF output."""

import io

import numpy as np
import pytest

pytest.importorskip("jax")

from gecoz_tpu.tools.batch_search import find_batched
from gecoz_tpu.tools import driver
from conftest import random_block, random_dna
from test_fm import build_fm
from test_gcz_files import write_fasta


def test_find_batched_matches_host(rng):
    data, seqs = random_block(rng, nseq=3, minlen=100, maxlen=500,
                              alphabet=b"ACGT")
    fm = build_fm(data, rate=8)
    pats = []
    for plen in (2, 4, 7, 11):
        for _ in range(6):
            pats.append(bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                                         size=plen)))
    pats.append(b"X")  # absent symbol
    results = find_batched(fm, pats)
    for p, res in zip(pats, results):
        want = fm.find(p)
        assert set(res) == set(want), p
        for k in want:
            assert np.array_equal(res[k], want[k]), (p, k)


def test_gff_search_device_matches_host(tmp_path, rng):
    seq = random_dna(rng, 3000)
    fa = tmp_path / "ref.fa"
    write_fasta(fa, [("chrR", seq)])
    gcz = tmp_path / "r.gcz"
    driver.index_fasta(fa, gcz)

    qf = tmp_path / "q.fa"
    queries = [("q1|note1", bytes(seq[100:120])),
               ("q2", bytes(seq[500:508]))]
    write_fasta(qf, [(h, np.frombuffer(s, np.uint8)) for h, s in queries])

    host = io.StringIO()
    driver.gff_search(gcz, qf, out=host, backend="numpy")
    dev = io.StringIO()
    driver.gff_search(gcz, qf, out=dev, backend="device")
    assert host.getvalue() == dev.getvalue()
    assert "ID=q1;Note=note1" in host.getvalue()
