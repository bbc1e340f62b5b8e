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


def test_backward_search_1edit_finds_mutated_pieces(world, rng):
    """Pieces carrying exactly one edit (sub, deleted ref char, or
    inserted read char): the exact search must miss them, the 1-edit
    track search must recover an interval that resolves to the true
    position (the GEM ≤e-edit seed semantic)."""
    codes, fm, dev = world
    k = 11
    T = 8 * k - 4
    B, S = 3, 6
    win = np.zeros((B, S, k), np.int32)
    ok = np.ones((B, S), bool)
    starts = rng.integers(0, len(codes) - k - 2, (B, S))
    for b in range(B):
        for s_ in range(S):
            s0 = int(starts[b, s_])
            w = codes[s0:s0 + k].astype(np.int32)
            if b == 0:                               # one substitution
                w[int(rng.integers(0, k))] ^= int(rng.integers(1, 4))
            elif b == 1:                             # read inserts a char
                j = int(rng.integers(1, k - 1))
                w = np.concatenate([w[:j], [int(rng.integers(0, 4))],
                                    w[:k - 1]])[:k]
                w[j + 1:] = codes[s0 + j:s0 + k - 1]
            else:                                    # read drops a ref char
                j = int(rng.integers(1, k - 1))
                w = np.concatenate(
                    [w[:j], codes[s0 + j + 1:s0 + k + 1]]).astype(np.int32)
            win[b, s_] = w
    lo1, hi1 = fmops.backward_search_1edit(win, ok, dev, k, kinds="sdi")
    lo1, hi1 = np.asarray(lo1), np.asarray(hi1)
    assert lo1.shape == (B, S, T)
    for b in range(B):
        for s_ in range(S):
            # union of track candidates must contain the true position
            found = set()
            for t in range(T):
                for r in range(int(lo1[b, s_, t]), int(hi1[b, s_, t])):
                    found.add(fm.resolve_row(r) % (fm.n + 1))
            assert int(starts[b, s_]) in found, (b, s_)
    # a clean window yields nothing on the variant tracks that matches
    # its own position as a length-k pattern (variants differ there)
    clean = codes[100:100 + k].astype(np.int32)[None, None, :]
    lo_c, hi_c = fmops.backward_search_1edit(clean, np.ones((1, 1), bool),
                                             dev, k, kinds="sdi")
    typ, pos, aux, ln = fmops.edit1_tracks(k, kinds="sdi")
    for t in range(T):
        if ln[t] != k:                # del/ins variants legitimately
            continue                  # match offset-by-one positions
        for r in range(int(lo_c[0, 0, t]), int(hi_c[0, 0, t])):
            assert fm.resolve_row(r) % (fm.n + 1) != 100


def test_seed_hits_fm_sub1_recovers_noisy_read(world, rng):
    """seed_hits_fm with sub1_cands: a read whose every window carries
    a substitution yields no exact-piece hits but a full hit set on the
    1-sub tracks, at the true diagonal."""
    codes, fm, dev = world
    k = 11
    L = 256
    reads = np.full((1, L), 4, np.int32)
    s0 = 5000
    frag = codes[s0:s0 + 200].astype(np.int32)
    for w0 in range(0, 200 - k, k):                  # a sub every k bp:
        frag[w0 + int(rng.integers(0, k))] ^= 2      # no clean window
    reads[0, :200] = frag
    lens = np.array([200], np.int32)
    grid = make_qpos_grid(L, k, 7)
    kw = dict(k=k, cands_per_seed=8, max_hits=256, sa_rate=fm.sa_rate)
    exact = seed_hits_fm(reads, lens, grid, dev, **kw)
    sub1 = seed_hits_fm(reads, lens, grid, dev, sub1_cands=2, **kw)
    n_exact = int(np.asarray(exact["valid"]).sum())
    v = np.asarray(sub1["valid"])[0]
    qp = np.asarray(sub1["qpos"])[0][v]
    rp = np.asarray(sub1["rpos"])[0][v].astype(np.int64)
    st = np.asarray(sub1["strand"])[0][v]
    on_diag = ((st == 0) & (rp - qp == s0)).sum()
    assert on_diag >= 10 > n_exact, (on_diag, n_exact)


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
