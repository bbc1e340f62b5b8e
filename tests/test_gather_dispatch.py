"""Device-side DP window assembly (ops/banded_sw.py::gather_windows)
must reproduce exactly the q / t_win arrays the host assembly
(DpBatcher._build_arrays / make_t_window) would upload, for every
descriptor case the Aligner emits: gap windows on both strands, and
reversed left-extension / forward right-extension windows."""

import numpy as np
import pytest

from lamsa_tpu.ops.banded_sw import gather_windows
from lamsa_tpu.ops.banded_sw_xla import make_t_window
from lamsa_tpu.pipeline.aln import Aligner


def _revcomp(c):
    comp = np.where(c < 4, 3 - c, c)
    return comp[::-1].astype(np.uint8)


def test_gather_windows_matches_host_assembly(rng):
    M, W = 128, 128
    Lref = 5000
    ref = rng.integers(0, 4, Lref).astype(np.uint8)
    ref[100:110] = 4                       # N run
    reads = [rng.integers(0, 5, int(rng.integers(60, 300))).astype(np.uint8)
             for _ in range(6)]
    flat = np.concatenate(reads)
    offs = np.zeros(len(reads) + 1, np.int64)
    np.cumsum([len(r) for r in reads], out=offs[1:])

    cases = []
    for ri, read in enumerate(reads):
        L = len(read)
        off = int(offs[ri])
        for strand in (0, 1):
            qseq = read if strand == 0 else _revcomp(read)
            # gap (forward window)
            w0 = int(rng.integers(0, L - 20))
            m = int(rng.integers(1, min(M, L - w0)))
            ra = int(rng.integers(0, Lref - 200))
            n = int(rng.integers(max(1, m - 30), m + 30))
            q_seg = qseq[w0:w0 + m]
            t_seg = ref[ra:ra + n]
            n = len(t_seg)
            lo = min(0, n - m) - (W - (abs(n - m) + 1)) // 2
            cases.append((q_seg, t_seg,
                          Aligner._qdesc(off, L, strand, w0, m, 0),
                          (ra, 1), lo))
            # left extension: reversed q, reversed t ending at r0
            r0 = int(rng.integers(50, Lref))
            tlen = min(m + 48, r0)
            q_seg = qseq[w0:w0 + m][::-1]
            t_seg = ref[r0 - tlen:r0][::-1]
            cases.append((q_seg, t_seg,
                          Aligner._qdesc(off, L, strand, w0, m, 1),
                          (r0 - 1, -1), -(W // 2)))
            # right extension: forward q, forward t from re_
            re_ = int(rng.integers(0, Lref - 10))
            tlen = min(m + 48, Lref - re_)
            q_seg = qseq[w0:w0 + m]
            t_seg = ref[re_:re_ + tlen]
            cases.append((q_seg, t_seg,
                          Aligner._qdesc(off, L, strand, w0, m, 0),
                          (re_, 1), -(W // 2)))

    B = len(cases)
    qb = np.zeros(B, np.int32)
    qs = np.ones(B, np.int32)
    qc = np.zeros(B, np.int32)
    tb = np.zeros(B, np.uint32)
    ts = np.ones(B, np.int32)
    ml = np.zeros(B, np.int32)
    nl = np.zeros(B, np.int32)
    lo_arr = np.zeros(B, np.int32)
    for b, (q_seg, t_seg, qd, td, lo) in enumerate(cases):
        qb[b], qs[b], qc[b] = qd
        tb[b], ts[b] = td
        ml[b], nl[b], lo_arr[b] = len(q_seg), len(t_seg), lo

    q_dev, t_dev = gather_windows(flat, ref, qb, qs, qc, tb, ts, ml, nl,
                                  lo_arr, M=M, W=W)
    q_dev, t_dev = np.asarray(q_dev), np.asarray(t_dev)

    for b, (q_seg, t_seg, qd, td, lo) in enumerate(cases):
        m = len(q_seg)
        assert np.array_equal(q_dev[b, :m], q_seg.astype(np.int32)), \
            f"case {b}: q window differs"
        assert (q_dev[b, m:] == 4).all()
        want_t = make_t_window(t_seg, lo, M, W)
        # host pads with T_SENTINEL=5 too
        assert np.array_equal(t_dev[b], want_t), \
            f"case {b}: t window differs"


def test_two_level_ref_gather_matches_flat(rng, monkeypatch):
    """gather_windows with the 2D pack_ref_device layout (genomes past
    int32-safe gather indexing, e.g. GRCh38) == the flat layout."""
    import lamsa_tpu.ops.banded_sw as bsw

    M, W = 128, 128
    Lref = 5000
    ref = rng.integers(0, 5, Lref).astype(np.uint8)
    B = 16
    qb = np.zeros(B, np.int32)
    qs = np.ones(B, np.int32)
    qc = np.zeros(B, np.int32)
    tb = rng.integers(0, Lref - 300, B).astype(np.uint32)
    ts = np.where(np.arange(B) % 2 == 0, 1, -1).astype(np.int32)
    tb = np.where(ts < 0, tb + 250, tb).astype(np.uint32)
    ml = rng.integers(10, M, B).astype(np.int32)
    nl = rng.integers(10, 200, B).astype(np.int32)
    lo = np.full(B, -(W // 2), np.int32)
    flat = rng.integers(0, 5, 4096).astype(np.uint8)

    q1, t1 = bsw.gather_windows(flat, ref, qb, qs, qc, tb, ts, ml, nl,
                                lo, M=M, W=W)
    monkeypatch.setattr(bsw, "REF_CHUNK_BITS", 9)
    C = 1 << 9
    pad = (-Lref) % C
    ref2 = np.concatenate([ref, np.full(pad, 4, np.uint8)]).reshape(-1, C)
    q2, t2 = bsw.gather_windows(flat, ref2, qb, qs, qc, tb, ts, ml, nl,
                                lo, M=M, W=W)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
