"""Unit tests for skeleton assembly: chain backtracking, multi-chain
selection, foreign-gap splitting, SV classification, block merging."""

import numpy as np

from lamsa_tpu.config import AlignConfig
from lamsa_tpu.pipeline.skeleton import (Part, anchors_to_blocks,
                                         backtrack_chains, classify_events,
                                         split_parts_on_foreign_gaps)

K = 13


def make_chain_arrays(chains, H=64, read_len=2000):
    """chains: list of (strand, [(qpos, rpos), ...]) in scan order."""
    qpos = np.zeros(H, np.int64)
    rpos = np.zeros(H, np.int64)
    strand = np.zeros(H, np.int64)
    valid = np.zeros(H, bool)
    f = np.zeros(H, np.int64)
    pred = np.full(H, -1, np.int64)
    i = 0
    for st, anchors in chains:
        prev = -1
        for n, (q, r) in enumerate(anchors):
            qpos[i], rpos[i], strand[i] = q, r, st
            valid[i] = True
            f[i] = (n + 1) * K
            pred[i] = prev
            prev = i
            i += 1
    return f, pred, qpos, rpos, strand, valid


def test_backtrack_single_chain():
    f, pred, qp, rp, st, v = make_chain_arrays(
        [(0, [(i * 20, 1000 + i * 20) for i in range(5)])])
    parts, alt, _ = backtrack_chains(f, pred, qp, rp, st, v, k=K,
                                     read_len=2000)
    assert len(parts) == 1
    p = parts[0]
    assert p.n_anchors == 5 and p.strand == 0
    assert p.read_start == 0 and p.read_end == 4 * 20 + K
    assert alt == 0


def test_backtrack_rejects_overlapping_weaker_chain():
    # second chain covers the same read region with lower score
    f, pred, qp, rp, st, v = make_chain_arrays([
        (0, [(i * 20, 1000 + i * 20) for i in range(6)]),
        (0, [(i * 20 + 3, 50000 + i * 20) for i in range(3)]),
    ])
    parts, alt, _ = backtrack_chains(f, pred, qp, rp, st, v, k=K,
                                     read_len=2000)
    assert len(parts) == 1
    assert int(parts[0].anchors[0, 1]) == 1000
    assert alt == 3 * K        # rejected chain's score recorded for MAPQ


def test_backtrack_keeps_disjoint_chains():
    f, pred, qp, rp, st, v = make_chain_arrays([
        (0, [(i * 20, 1000 + i * 20) for i in range(4)]),
        (0, [(500 + i * 20, 90000 + i * 20) for i in range(4)]),
    ])
    parts, _, _ = backtrack_chains(f, pred, qp, rp, st, v, k=K,
                                   read_len=2000)
    assert len(parts) == 2
    assert parts[0].read_start < parts[1].read_start


def test_split_on_foreign_gap():
    # a '+' chain spanning [0..400] with a hole [150..250] that a '-'
    # part claims: must split into two '+' parts (inversion signature)
    plus = Part(strand=0,
                anchors=np.array([[q, 1000 + q] for q in
                                  (0, 50, 100, 300, 350)], np.int64),
                score=5 * K, read_start=0, read_end=363)
    # '-' part in rc coords covering read [150, 250): rc qpos = L-q-K
    L = 400
    minus = Part(strand=1,
                 anchors=np.array([[L - 250, 5000], [L - 200, 5050],
                                   [L - 163, 5087]], np.int64),
                 score=3 * K, read_start=150, read_end=250)
    out = split_parts_on_foreign_gaps([plus, minus], k=K, read_len=L)
    strands = sorted((p.strand, p.read_start) for p in out)
    plus_parts = [p for p in out if p.strand == 0]
    assert len(plus_parts) == 2, [(p.strand, p.read_start, p.read_end)
                                  for p in out]
    assert plus_parts[0].read_end <= 150 + K
    assert plus_parts[1].read_start >= 250 - K


def test_classify_events_types():
    def part(strand, q0, q1, r0, r1):
        anchors = np.array([[q0, r0], [q1 - K, r1 - K]], np.int64)
        return Part(strand=strand, anchors=anchors, score=2 * K,
                    read_start=q0 if strand == 0 else None or q0,
                    read_end=q1)

    cfg = AlignConfig()
    # deletion: ref jump >> read jump
    a = part(0, 0, 300, 1000, 1300)
    b = part(0, 310, 600, 2300, 2590)
    ev = classify_events([a, b], None, sv_min_size=30, sv_max_size=100000)
    assert ev[0]["type"] == "deletion"
    # insertion: read jump >> ref jump
    b2 = part(0, 500, 800, 1310, 1610)
    ev = classify_events([a, b2], None, sv_min_size=30, sv_max_size=100000)
    assert ev[0]["type"] == "insertion"
    # duplication: ref goes backwards
    b3 = part(0, 310, 600, 1000, 1290)
    ev = classify_events([a, b3], None, sv_min_size=30, sv_max_size=100000)
    assert ev[0]["type"] == "duplication"
    # translocation: huge jump
    b4 = part(0, 310, 600, 900000, 900290)
    ev = classify_events([a, b4], None, sv_min_size=30, sv_max_size=100000)
    assert ev[0]["type"] == "translocation"
    # inversion: strand flip
    b5 = part(1, 310, 600, 1310, 1600)
    ev = classify_events([a, b5], None, sv_min_size=30, sv_max_size=100000)
    assert ev[0]["type"] == "inversion"


def test_anchors_to_blocks_merge_and_conflict():
    # same-diagonal overlapping anchors merge; off-diagonal overlap drops
    anchors = np.array([
        [0, 1000],        # block A start
        [5, 1005],        # same diag, overlapping -> extends A to 18
        [10, 1010],       # same diag -> extends A to 23
        [15, 1700],       # off-diag overlap -> dropped
        [40, 1040],       # clean new block (same diag as A)
    ], np.int64)
    blocks = anchors_to_blocks(anchors, K)
    assert blocks.shape[0] == 2
    assert list(blocks[0]) == [0, 1000, 10 + K]
    assert list(blocks[1]) == [40, 1040, K]


def test_native_anchors_to_blocks_matches_python(rng):
    from lamsa_tpu import native
    from lamsa_tpu.pipeline.skeleton import anchors_to_blocks_py
    if not native.available():
        import pytest
        pytest.skip("no native lib")
    k = 13
    for _ in range(50):
        n = int(rng.integers(0, 60))
        q = np.cumsum(rng.integers(1, 20, n)) + 5
        r = q + rng.integers(-3, 4, n).cumsum() + 100
        anchors = np.stack([q, r], axis=1).astype(np.int64) \
            if n else np.zeros((0, 2), np.int64)
        got = native.anchors_to_blocks(anchors, k)
        want = anchors_to_blocks_py(anchors, k)
        assert np.array_equal(got, want)


def test_native_backtrack_matches_python_spec(rng):
    """Native lamsa_backtrack_chains == _select_chains_py on random
    sparse-DP outputs (selection order, scores, secondary flags, alt)."""
    from lamsa_tpu import native
    from lamsa_tpu.pipeline.skeleton import _select_chains_py

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    for trial in range(60):
        H = int(rng.integers(4, 200))
        read_len = int(rng.integers(100, 3000))
        k = 13
        qpos = rng.integers(0, max(1, read_len - k), H).astype(np.int32)
        strand = rng.integers(0, 2, H).astype(np.int32)
        valid = (rng.random(H) < 0.9)
        f = np.where(valid, rng.integers(0, 300, H), 0).astype(np.int32)
        pred = np.full(H, -1, np.int32)
        for i in range(1, H):
            if rng.random() < 0.7:
                pred[i] = int(rng.integers(0, i))
        kw = dict(k=k, read_len=read_len, min_anchors=2,
                  min_score=int(rng.integers(0, 60)),
                  max_chains=int(rng.integers(1, 6)),
                  max_overlap_frac=0.5,
                  keep_secondaries=int(rng.integers(0, 4)))
        want, alt_w = _select_chains_py(f, pred, qpos, strand, valid, **kw)
        got, alt_g = native.backtrack_chains_native(f, pred, qpos, strand,
                                                    valid, **kw)
        assert alt_g == alt_w, trial
        assert len(got) == len(want), trial
        for (gi, gs, gsc, gst, grs, gre), (wi, ws, wsc, wst, wrs, wre) \
                in zip(got, want):
            np.testing.assert_array_equal(gi, wi)
            assert (gs, gsc, gst, grs, gre) == (ws, wsc, wst, wrs, wre)
