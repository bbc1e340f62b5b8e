"""Substrate tests: FASTA/FASTQ, packed reference, SAM formatting."""

import gzip

import numpy as np

from lamsa_tpu.io import fasta as fx
from lamsa_tpu.io.refpack import PackedReference
from lamsa_tpu.io.sam import (SamRecord, cigar_from_string, cigar_query_len,
                              cigar_ref_len, cigar_to_string,
                              format_sam_record, sam_header)
from lamsa_tpu import sim


def test_encode_decode_roundtrip():
    s = "ACGTNacgtnXx"
    codes = fx.encode_seq(s)
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 4, 4]
    assert fx.decode_seq(codes[:5]) == "ACGTN"


def test_revcomp4():
    assert fx.revcomp4(fx.encode_seq("ACGTN")) == fx.encode_seq("NACGT")


def test_fasta_multiline_and_gzip(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">s1 a comment\nACGT\nACG\n>s2\nTTTT\n")
    recs = fx.read_fasta(str(p))
    assert [r.name for r in recs] == ["s1", "s2"]
    assert recs[0].seq == "ACGTACG"
    assert recs[0].comment == "a comment"
    assert recs[1].seq == "TTTT"

    gz = tmp_path / "x.fa.gz"
    gz.write_bytes(gzip.compress(p.read_bytes()))
    recs2 = fx.read_fasta(str(gz))
    assert [(r.name, r.seq) for r in recs2] == [(r.name, r.seq) for r in recs]


def test_fastq(tmp_path):
    p = tmp_path / "x.fq"
    p.write_text("@r1\nACGT\n+\nIIII\n@r2 c\nGG\n+ anything\n!!\n")
    recs = list(fx.read_fastx(str(p)))
    assert recs[0].name == "r1" and recs[0].seq == "ACGT"
    assert recs[0].qual == "IIII"
    assert recs[1].name == "r2" and recs[1].qual == "!!"


def test_packed_reference_roundtrip(tmp_path, rng):
    genome = sim.random_genome(rng, 3000, n_seqs=3)
    genome[1].seq = genome[1].seq[:100] + "N" * 7 + genome[1].seq[107:]
    fa = tmp_path / "g.fa"
    fx.write_fasta(str(fa), genome)
    ref = PackedReference.from_fasta(str(fa))
    assert ref.num_seqs == 3
    assert ref.total_len == 3000
    # global/local coordinate mapping
    g = ref.local_to_global(1, 50)
    assert ref.global_to_local(g) == (1, 50)
    # N run recorded
    assert len(ref.amb_runs) == 1
    assert tuple(ref.amb_runs[0]) == (1000 + 100, 7)
    # save/load identical
    d = tmp_path / "g.lti"
    ref.save(str(d))
    ref2 = PackedReference.load(str(d))
    assert ref2.names == ref.names
    assert np.array_equal(ref2.codes, ref.codes)
    assert np.array_equal(ref2.offsets, ref.offsets)


def test_cigar_roundtrip():
    cig = cigar_from_string("5S10M2I3D1M")
    assert cigar_to_string(cig) == "5S10M2I3D1M"
    assert cigar_query_len(cig) == 5 + 10 + 2 + 1
    assert cigar_ref_len(cig) == 10 + 3 + 1
    # merge adjacent
    assert cigar_to_string([(0, 5), (0, 3)]) == "8M"


def test_sam_record_format():
    rec = SamRecord(qname="r1", flag=16, rname="chr1", pos=99, mapq=60,
                    cigar=cigar_from_string("4S10M"), seq="A" * 14,
                    tags={"NM": 2, "AS": 8, "SA": "chr1,5,+,3M,60,0;"})
    line = format_sam_record(rec)
    f = line.split("\t")
    assert f[:6] == ["r1", "16", "chr1", "100", "60", "4S10M"]
    assert "NM:i:2" in f and "AS:i:8" in f
    assert "SA:Z:chr1,5,+,3M,60,0;" in f
    assert rec.sa_item() == "chr1,100,-,4S10M,60,2"


def test_sam_header(tmp_path, rng):
    genome = sim.random_genome(rng, 200, n_seqs=2)
    fa = tmp_path / "g.fa"
    fx.write_fasta(str(fa), genome)
    ref = PackedReference.from_fasta(str(fa))
    h = sam_header(ref, "aln x y")
    assert "@SQ\tSN:chr1\tLN:100" in h
    assert "@SQ\tSN:chr2\tLN:100" in h


def test_simulator_truth_parses(rng):
    genome = sim.random_genome(rng, 20000)
    reads = sim.simulate_reads(rng, genome, 20, read_len=(500, 1500),
                               sv_fraction=0.5)
    for r in reads:
        parts = sim.parse_truth(r.name)
        assert parts
        for p in parts:
            assert p.ref_end > p.ref_start
            assert p.q_end > p.q_start
            assert p.strand in "+-"


def test_simulator_error_free_reads_match_genome(rng):
    genome = sim.random_genome(rng, 50000)
    reads = sim.simulate_reads(rng, genome, 10, read_len=(400, 800),
                               sub=0, ins=0, dele=0, sv_fraction=0.0)
    gseq = genome[0].seq
    for r in reads:
        (p,) = sim.parse_truth(r.name)
        frag = gseq[p.ref_start:p.ref_end]
        if p.strand == "-":
            frag = sim._revcomp(frag)
        assert r.seq == frag
