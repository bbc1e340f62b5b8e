"""Pipeline robustness on degenerate inputs."""

import numpy as np

from lamsa_tpu import sim
from lamsa_tpu.config import AlignConfig, ScoreParams
from lamsa_tpu.io.fasta import FastxRecord
from lamsa_tpu.io.sam import FLAG_UNMAPPED, cigar_query_len
from tests.test_e2e import make_ref

CFG = AlignConfig(scores=ScoreParams(match=1, mismatch=3, gap_open=2,
                                     gap_ext=1), seed_step=10)


def test_degenerate_reads(rng):
    from lamsa_tpu.pipeline.aln import Aligner
    genome, ref, idx = make_ref(rng, 50000)
    g = genome[0].seq
    reads = [
        FastxRecord(name="tiny", seq="ACGT"),             # shorter than k
        FastxRecord(name="exact_k", seq=g[100:113]),      # == k
        FastxRecord(name="n_run", seq=g[2000:2200] + "N" * 50
                    + g[2250:2450]),                      # N gap inside
        FastxRecord(name="all_n", seq="N" * 300),
        FastxRecord(name="normal", seq=g[30000:30600]),
        FastxRecord(name="homopolymer", seq="A" * 250),
    ]
    aligner = Aligner(ref, idx, CFG)
    out = aligner.align_batch(reads)
    assert len(out) == len(reads)
    for read, recs in zip(reads, out):
        assert recs, read.name
        for rec in recs:
            if rec.flag & FLAG_UNMAPPED:
                continue
            assert cigar_query_len(rec.cigar) == len(read.seq), read.name
    # tiny and all-N must be unmapped
    assert out[0][0].flag & FLAG_UNMAPPED
    assert out[3][0].flag & FLAG_UNMAPPED
    # the normal read must map correctly
    assert not out[4][0].flag & FLAG_UNMAPPED
    assert out[4][0].pos == 30000


def test_read_at_genome_edges(rng):
    from lamsa_tpu.pipeline.aln import Aligner
    genome, ref, idx = make_ref(rng, 50000)
    g = genome[0].seq
    reads = [
        FastxRecord(name="left_edge", seq=g[:400]),
        FastxRecord(name="right_edge", seq=g[-400:]),
    ]
    aligner = Aligner(ref, idx, CFG)
    out = aligner.align_batch(reads)
    assert out[0][0].pos == 0
    assert out[1][0].pos == 50000 - 400
    for read, recs in zip(reads, out):
        assert cigar_query_len(recs[0].cigar) == len(read.seq)


def test_empty_batch():
    import numpy as np
    from lamsa_tpu.pipeline.aln import Aligner
    rng = np.random.default_rng(0)
    genome, ref, idx = make_ref(rng, 20000)
    aligner = Aligner(ref, idx, CFG)
    assert aligner.align_batch([]) == []


def test_read_longer_than_largest_bucket(rng):
    from lamsa_tpu.config import AlignConfig
    from lamsa_tpu.pipeline.aln import Aligner
    genome, ref, idx = make_ref(rng, 60000)
    g = genome[0].seq
    cfg = CFG.replace(read_len_buckets=(512, 1024))  # force overflow path
    read = FastxRecord(name="big", seq=g[1000:1000 + 3000])
    aligner = Aligner(ref, idx, cfg)
    out = aligner.align_batch([read])
    rec = out[0][0]
    assert not rec.flag & FLAG_UNMAPPED
    assert rec.pos == 1000
    assert cigar_query_len(rec.cigar) == 3000
