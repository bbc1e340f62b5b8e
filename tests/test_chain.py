"""Sparse-DP chain kernel tests, incl. a NumPy reference implementation."""

import numpy as np

from lamsa_tpu.ops.chain import chain_hits


def chain_ref(qpos, rpos, strand, valid, weight, lookback, max_dist,
              diag_slack):
    """O(H * LB) NumPy reference of ops/chain.py."""
    H = len(qpos)
    f = np.zeros(H, np.int64)
    pred = np.full(H, -1, np.int64)
    for k in range(H):
        if not valid[k]:
            continue
        best, arg = 0, -1
        for l in range(max(0, k - lookback), k):
            if not valid[l] or strand[l] != strand[k]:
                continue
            dq = qpos[k] - qpos[l]
            dr = rpos[k] - rpos[l]
            if dq <= 0 or dq > max_dist or dr <= 0 or dr > max_dist:
                continue
            if abs(dq - dr) > diag_slack:
                continue
            cost = abs(dq - dr) + min(dq, dr) // 64
            cand = f[l] - cost
            if cand > best:       # strict: first max wins ties, matches argmax
                best, arg = cand, l
        f[k] = weight + max(best, 0)
        pred[k] = arg
    return f, pred


def _sorted_hits(rng, H, n_chains=2, hit_every=20):
    """Synthesize hits: a few co-linear chains + noise, sorted properly."""
    rows = []
    for c in range(n_chains):
        strand = int(rng.integers(0, 2))
        q0 = int(rng.integers(0, 100))
        r0 = int(rng.integers(0, 100000))
        for t in range(H // (n_chains + 1)):
            jq = int(rng.integers(0, 6))
            jr = int(rng.integers(0, 6))
            rows.append((strand, q0 + t * hit_every + jq,
                         r0 + t * hit_every + jr))
    for _ in range(H - len(rows)):
        rows.append((int(rng.integers(0, 2)), int(rng.integers(0, 2000)),
                     int(rng.integers(0, 200000))))
    rows.sort()
    rows = rows[:H]
    strand = np.array([r[0] for r in rows], np.int32)
    qpos = np.array([r[1] for r in rows], np.int32)
    rpos = np.array([r[2] for r in rows], np.int32)
    valid = np.ones(H, bool)
    # punch some invalid holes
    valid[rng.integers(0, H, H // 10)] = False
    return qpos, rpos, strand, valid


def test_chain_matches_reference(rng):
    B, H = 4, 64
    W = dict(weight=11, lookback=16, max_dist=5000, diag_slack=100)
    qs, rs, ss, vs = [], [], [], []
    for _ in range(B):
        q, r, s, v = _sorted_hits(rng, H)
        qs.append(q)
        rs.append(r)
        ss.append(s)
        vs.append(v)
    f, pred = chain_hits(np.stack(qs), np.stack(rs), np.stack(ss),
                         np.stack(vs), **W)
    f, pred = np.asarray(f), np.asarray(pred)
    for b in range(B):
        ef, ep = chain_ref(qs[b], rs[b], ss[b], vs[b], **W)
        assert np.array_equal(f[b], ef), f"scores differ, batch {b}"
        assert np.array_equal(pred[b], ep), f"preds differ, batch {b}"


def test_chain_simple_colinear():
    # 5 perfectly co-linear anchors chain into f = weight * n
    n = 5
    qpos = np.arange(n, dtype=np.int32)[None] * 20
    rpos = qpos + 1000
    strand = np.zeros((1, n), np.int32)
    valid = np.ones((1, n), bool)
    f, pred = chain_hits(qpos, rpos, strand, valid, weight=11, lookback=8,
                         max_dist=5000, diag_slack=100)
    f, pred = np.asarray(f), np.asarray(pred)
    assert f[0, -1] == 11 * n
    assert list(pred[0]) == [-1, 0, 1, 2, 3]


def test_chain_splits_on_strand_and_jump():
    # two co-linear runs separated by a huge ref jump must not link
    qpos = np.array([[0, 20, 40, 60, 80, 100]], np.int32)
    rpos = np.array([[0, 20, 40, 500060, 500080, 500100]], np.int32)
    strand = np.zeros((1, 6), np.int32)
    valid = np.ones((1, 6), bool)
    f, pred = chain_hits(qpos, rpos, strand, valid, weight=11, lookback=8,
                         max_dist=5000, diag_slack=100)
    pred = np.asarray(pred)
    assert pred[0, 3] == -1          # break at the jump
    assert pred[0, 4] == 3

    # strand flip breaks chains even on the same diagonal
    strand2 = np.array([[0, 0, 0, 1, 1, 1]], np.int32)
    rpos2 = qpos + 7
    f2, pred2 = chain_hits(qpos, rpos2, strand2, valid, weight=11,
                           lookback=8, max_dist=5000, diag_slack=100)
    assert np.asarray(pred2)[0, 3] == -1
