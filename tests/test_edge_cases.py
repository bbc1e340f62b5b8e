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


def test_md_tag(rng):
    from lamsa_tpu.pipeline.aln import Aligner
    from lamsa_tpu.pipeline.extend import md_tag
    import numpy as np
    # unit: known cigar/windows
    q = np.array([0, 1, 2, 3, 0, 0, 1], np.uint8)       # ACGTAAC
    t = np.array([0, 1, 1, 3, 2, 0, 1], np.uint8)       # ACCTGAC
    assert md_tag(q, t, [(0, 7)]) == "2C1G2"            # mism at 2 and 4
    t2 = np.array([0, 1, 2, 3, 1, 2, 0, 0, 1], np.uint8)
    # 4M 2D 3M with matches around a CG deletion
    assert md_tag(np.array([0, 1, 2, 3, 0, 0, 1], np.uint8), t2,
                  [(0, 4), (2, 2), (0, 3)]) == "4^CG3"
    # e2e: aligned record carries a consistent MD tag
    genome, ref, idx = make_ref(rng, 30000)
    g = genome[0].seq
    frag = g[5000:5400]
    frag = frag[:100] + ("A" if frag[100] != "A" else "C") + frag[101:]
    read = FastxRecord(name="mdread", seq=frag)
    aligner = Aligner(ref, idx, CFG.replace(emit_md=True))
    rec = aligner.align_batch([read])[0][0]
    assert "MD" in rec.tags
    md = rec.tags["MD"]
    # MD match-run lengths + deletion runs must sum to the ref length
    import re as _re
    total = sum(int(x) for x in _re.findall(r"\d+", md))
    dels = sum(len(x) - 1 for x in _re.findall(r"\^[ACGTN]+", md))
    from lamsa_tpu.io.sam import cigar_ref_len
    from lamsa_tpu.io.sam import cigar_pairs
    core = [(op, ln) for op, ln in cigar_pairs(rec.cigar) if op != 4]
    assert total + dels + _count_md_mismatches(md) == cigar_ref_len(core)


def _count_md_mismatches(md: str) -> int:
    import re as _re
    no_dels = _re.sub(r"\^[ACGTN]+", "", md)
    return len(_re.findall(r"[ACGTN]", no_dels))


def test_zdrop_clips_extension_at_junk():
    """DpBatcher extend honors ScoreParams.zdrop: a junk block followed
    by a spurious recovery stops at the pre-junk peak when zdrop is on,
    but extends through when off (SURVEY.md section 3.4 ksw_extend)."""
    import numpy as np

    from lamsa_tpu.config import ScoreParams
    from lamsa_tpu.pipeline.extend import DpBatcher

    rng = np.random.default_rng(9)
    t = rng.integers(0, 4, 456).astype(np.uint8)
    q = t.copy()
    q[224:256] = 4                      # drop 69 at group boundary 256

    on = DpBatcher(ScoreParams(zdrop=50))
    h_on = on.add_extend(q, t, to_end_bonus=5)
    on.run()
    r_on = on.result(h_on)
    assert r_on.q_used == 224 and r_on.score == 224

    off = DpBatcher(ScoreParams(zdrop=0))
    h_off = off.add_extend(q, t, to_end_bonus=5)
    off.run()
    r_off = off.result(h_off)
    assert r_off.q_used == 456 and r_off.score == 328
