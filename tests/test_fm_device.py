"""Device FM ops vs host FmIndex reference, and FM seeding vs k-mer
seeding equivalence on a unique-k-mer genome."""

import numpy as np
import pytest

from lamsa_tpu.index.fmindex import SA_RATE, FmIndex
from lamsa_tpu.index.kmer import KmerIndex
from lamsa_tpu.ops import fm as fmops
from lamsa_tpu.pipeline.seeding import (make_qpos_grid, seed_hits,
                                        seed_hits_fm)


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(9)
    codes = rng.integers(0, 4, 30000).astype(np.uint8)
    fm = FmIndex.build(codes, sa_rate=4)   # small rate: fast jit unroll
    return codes, fm, fmops.device_arrays(fm)


def test_device_backward_search_matches_host(world, rng):
    codes, fm, dev = world
    k = 9
    B, S = 4, 8
    win = np.zeros((B, S, k), np.int32)
    ok = np.ones((B, S), bool)
    starts = rng.integers(0, len(codes) - k, (B, S))
    for b in range(B):
        for s_ in range(S):
            win[b, s_] = codes[starts[b, s_]:starts[b, s_] + k]
    # poison a couple with N
    win[0, 0, 5] = 4
    lo, hi = fmops.backward_search(win, ok, dev, k)
    lo, hi = np.asarray(lo), np.asarray(hi)
    for b in range(B):
        for s_ in range(S):
            want = fm.backward_search(win[b, s_].astype(np.uint8)) \
                if (win[b, s_] < 4).all() else (0, 0)
            assert (lo[b, s_], hi[b, s_]) == want, (b, s_)


def test_device_resolve_matches_host(world, rng):
    codes, fm, dev = world
    rows = rng.integers(0, fm.n + 1, (64,)).astype(np.uint32)
    valid = np.ones(64, bool)
    pos = np.asarray(fmops.resolve_rows(rows, valid, dev, fm.sa_rate))
    for i, r in enumerate(rows):
        assert pos[i] == fm.resolve_row(int(r)) % (fm.n + 1), int(r)


def test_fm_seeding_matches_kmer_seeding(world, rng):
    codes, fm, dev = world
    k = 11
    kidx = KmerIndex.build(codes, k, max_hits_per_kmer=64)
    L = 256
    B = 4
    reads = np.full((B, L), 4, np.int32)
    lens = np.zeros(B, np.int32)
    for b in range(B):
        s_ = int(rng.integers(0, len(codes) - 200))
        frag = codes[s_:s_ + 200]
        if b % 2:
            frag = np.array([3, 2, 1, 0, 4], np.uint8)[frag][::-1]
        reads[b, :200] = frag
        lens[b] = 200
    grid = make_qpos_grid(L, k, 13)
    kw = dict(k=k, cands_per_seed=8, max_hits=256)
    h1 = seed_hits(reads, lens, grid, kidx.keys, kidx.starts, kidx.counts,
                   kidx.positions.astype(np.uint32), **kw)
    h2 = seed_hits_fm(reads, lens, grid, dev, sa_rate=fm.sa_rate, **kw)
    for key in ["qpos", "rpos", "strand", "valid"]:
        a, b_ = np.asarray(h1[key]), np.asarray(h2[key])
        assert np.array_equal(a, b_), key


def test_fm_seg_quota_keeps_tail_and_minus_strand(world, rng):
    """seg_quota budgets hits per (strand, read segment): with a tight
    max_hits and dense candidates, plain prefix truncation starves the
    read tail, while the quota keeps every populated segment
    represented (the GRCh38-scale failure mode)."""
    from lamsa_tpu.pipeline.seeding import N_SEG

    codes, fm, dev = world
    k = 11
    L = 256
    B = 2
    reads = np.full((B, L), 4, np.int32)
    lens = np.full(B, L, np.int32)
    for b in range(B):
        s_ = int(rng.integers(0, len(codes) - L))
        frag = codes[s_:s_ + L]
        if b:
            frag = np.array([3, 2, 1, 0, 4], np.uint8)[frag][::-1]
        reads[b] = frag
    grid = make_qpos_grid(L, k, 4)               # dense sampling
    kw = dict(k=k, cands_per_seed=8, max_hits=16, sa_rate=fm.sa_rate)
    plain = seed_hits_fm(reads, lens, grid, dev, **kw)
    quota = seed_hits_fm(reads, lens, grid, dev, seg_quota=1, **kw)
    for b in range(B):
        # prefix truncation: all kept hits crowd the low-qpos end
        qp_p = np.asarray(plain["qpos"][b])[np.asarray(plain["valid"][b])]
        qp_q = np.asarray(quota["qpos"][b])[np.asarray(quota["valid"][b])]
        segs_p = set(np.minimum(qp_p * N_SEG // L, N_SEG - 1))
        segs_q = set(np.minimum(qp_q * N_SEG // L, N_SEG - 1))
        assert len(segs_q) > len(segs_p), (b, segs_p, segs_q)
    # both strands of hits survive across the batch under quota
    st_q = np.asarray(quota["strand"])[np.asarray(quota["valid"])]
    assert set(st_q.tolist()) == {0, 1}
