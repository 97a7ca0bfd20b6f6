"""BAM/BAI golden-byte fixture: a spec-exact file hand-constructed from the
SAMv1 specification's worked example (section 1.1), built here with ONLY
struct + zlib — fully independent of gecoz's own writers — and decoded by
the production reader (BAMFileReader.java:43-120 semantics).

Covers: BGZF container with BC subfield across multiple members, BAM magic
+ header text + reference dictionary, alignment field unpacking (0-based ->
1-based positions, packed 4-bit SEQ, 0xFF '*' QUAL, CIGAR op words, int8
NM tag), '*' mate encoding (-1 refID), and a hand-built BAI driving the
binned range query.
"""

import struct
import zlib

from gecoz_tpu.formats.bam import BAMFileReader

SEQ_NIBBLE = {c: i for i, c in enumerate("=ACMGRSVTWYHKDBN")}
CIGAR_NUM = {op: i for i, op in enumerate("MIDNSHP=X")}


def bgzf_member(payload: bytes) -> bytes:
    c = zlib.compressobj(6, zlib.DEFLATED, -15)
    data = c.compress(payload) + c.flush()
    bsize = 18 + len(data) + 8
    head = (b"\x1f\x8b\x08\x04" + b"\x00" * 6 +
            struct.pack("<H", 6) + b"BC" + struct.pack("<HH", 2, bsize - 1))
    return head + data + struct.pack("<II", zlib.crc32(payload),
                                     len(payload) & 0xFFFFFFFF)


BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


def encode_alignment(qname, flag, pos0, mapq, bin_, cigar, seq, next_ref,
                     next_pos0, tlen, tags=b"") -> bytes:
    body = bytearray()
    body += struct.pack("<iiBBHHHiiii", 0, pos0, len(qname) + 1, mapq, bin_,
                        len(cigar), flag, len(seq), next_ref, next_pos0,
                        tlen)
    body += qname.encode() + b"\0"
    for n, op in cigar:
        body += struct.pack("<I", (n << 4) | CIGAR_NUM[op])
    nib = [SEQ_NIBBLE[c] for c in seq]
    if len(nib) % 2:
        nib.append(0)
    body += bytes((nib[i] << 4) | nib[i + 1] for i in range(0, len(nib), 2))
    body += b"\xff" * len(seq)                  # QUAL '*'
    body += tags
    return struct.pack("<i", len(body)) + bytes(body)


def build_fixture(tmp_path):
    text = "@HD\tVN:1.5\tSO:coordinate\n@SQ\tSN:ref\tLN:45\n"
    header = (b"BAM\x01" + struct.pack("<i", len(text)) + text.encode()
              + struct.pack("<i", 1)
              + struct.pack("<i", 4) + b"ref\0" + struct.pack("<i", 45))

    # SAMv1 section 1.1 worked example (subset), bin = reg2bin(...) = 4681
    recs = [
        encode_alignment("r001", 99, 6, 30, 4681,
                         [(8, "M"), (2, "I"), (4, "M"), (1, "D"), (3, "M")],
                         "TTAGATAAAGGATACTG", 0, 36, 39),
        encode_alignment("r002", 0, 8, 30, 4681,
                         [(3, "S"), (6, "M"), (1, "P"), (1, "I"), (4, "M")],
                         "AAAAGATAAGGATA", -1, -1, 0),
        encode_alignment("r001", 147, 36, 30, 4681, [(9, "M")],
                         "CAGCGGCAT", 0, 6, -39,
                         tags=b"NMc" + struct.pack("<b", 1)),
    ]
    m1 = bgzf_member(header)
    m2 = bgzf_member(b"".join(recs))
    bam = tmp_path / "golden.bam"
    bam.write_bytes(m1 + m2 + BGZF_EOF)

    # hand-built BAI: one bin (4681) with one chunk spanning all records,
    # one 16kb linear interval pointing at the first record
    voff0 = (len(m1) << 16) | 0
    voff_end = (len(m1) << 16) | len(b"".join(recs))
    bai = (b"BAI\x01" + struct.pack("<i", 1)
           + struct.pack("<i", 1)                       # n_bin
           + struct.pack("<Ii", 4681, 1)
           + struct.pack("<QQ", voff0, voff_end)
           + struct.pack("<i", 1)                       # n_intv
           + struct.pack("<Q", voff0))
    bai_path = tmp_path / "golden.bai"
    bai_path.write_bytes(bai)
    return bam, bai_path


def test_golden_bam_decodes_exactly(tmp_path):
    bam, bai = build_fixture(tmp_path)
    r = BAMFileReader(bam, bai_path=bai)
    assert r.header.text == "@HD\tVN:1.5\tSO:coordinate\n@SQ\tSN:ref\tLN:45\n"
    assert r.header.ref_names == ["ref"]
    assert r.header.ref_lengths == [45]

    recs = [rec for rec, _ in r.records()]
    assert len(recs) == 3
    a, b, c = recs
    assert (a.qname, a.flag, a.rname, a.pos, a.mapq) == \
        ("r001", 99, "ref", 7, 30)
    assert a.cigar == "8M2I4M1D3M"
    assert a.seq == "TTAGATAAAGGATACTG"
    assert a.qual == "*"
    assert (a.rnext, a.pnext, a.tlen) == ("ref", 37, 39)
    assert a.position_end() == 22                     # 8M+4M+1D+3M ref span

    assert (b.qname, b.flag, b.pos, b.cigar) == ("r002", 0, 9, "3S6M1P1I4M")
    assert (b.rnext, b.pnext, b.tlen) == ("*", 0, 0)  # '*' mate (-1 refID)
    assert b.seq == "AAAAGATAAGGATA"

    assert (c.qname, c.flag, c.pos, c.cigar, c.tlen) == \
        ("r001", 147, 37, "9M", -39)
    assert [(t.tag, t.type, t.value) for t in c.tags] == [("NM", "i", 1)]


def test_golden_bam_range_query(tmp_path):
    bam, bai = build_fixture(tmp_path)
    r = BAMFileReader(bam, bai_path=bai)
    # [8, 10) 0-based overlaps r001(7..22) and r002(9..18), not r001/147
    hits = r.search(0, 8, 10)
    assert [(h.qname, h.flag) for h in hits] == [("r001", 99), ("r002", 0)]
    # tail query catches only the mate
    hits = r.search(0, 40, 45)
    assert [(h.qname, h.flag) for h in hits] == [("r001", 147)]
    # empty region
    assert r.search(0, 22, 25) == []
    # an auto-built index (no .bai passed) agrees with the golden one
    r2 = BAMFileReader(bam)
    r2.bai = None
    assert [(h.qname, h.flag) for h in r2.search(0, 8, 10)] == \
        [("r001", 99), ("r002", 0)]
