"""Differential tests: XLA banded DP kernel vs the NumPy oracle.

Scores AND tracebacks must be bit-identical (shared tie-breaking
contract, ops/oracle.py docstring)."""

import numpy as np
import pytest

from lamsa_tpu.config import ScoreParams
from lamsa_tpu.ops import oracle
from lamsa_tpu.ops.banded_sw_xla import (banded_sw_batch, global_score,
                                         make_t_window, prepare_band)
from lamsa_tpu.ops.traceback import traceback_banded

S = ScoreParams(match=1, mismatch=3, gap_open=5, gap_ext=2)
S2 = ScoreParams(match=2, mismatch=4, gap_open=4, gap_ext=1)


def run_batch(pairs, M, W, scores):
    """pairs: list of (q, t) numpy arrays. Returns kernel result + metas."""
    B = len(pairs)
    q = np.zeros((B, M), np.int32)
    t_win = np.zeros((B, M + W), np.int32)
    m_len = np.zeros(B, np.int32)
    n_len = np.zeros(B, np.int32)
    lo = np.zeros(B, np.int32)
    for b, (qq, tt) in enumerate(pairs):
        m_len[b] = len(qq)
        n_len[b] = len(tt)
        lo[b] = prepare_band(len(qq), len(tt), W)
        q[b, :len(qq)] = qq
        t_win[b] = make_t_window(tt, int(lo[b]), M, W)
    res = banded_sw_batch(q, t_win, m_len, n_len, lo,
                          match=scores.match, mismatch=scores.mismatch,
                          gapo=scores.gap_open, gape=scores.gap_ext)
    gs = global_score(res, m_len, n_len, lo)
    return res, gs, m_len, n_len, lo


def mutate(rng, t, n_ops):
    q = list(t)
    for _ in range(n_ops):
        if not q:
            break
        k = int(rng.integers(0, len(q)))
        op = rng.random()
        if op < 0.4:
            q[k] = int(rng.integers(0, 4))
        elif op < 0.7:
            q.insert(k, int(rng.integers(0, 4)))
        else:
            del q[k]
    return np.array(q, np.uint8)


@pytest.mark.parametrize("scores", [S, S2])
def test_global_matches_oracle_random(rng, scores):
    W = 32
    M = 48
    pairs = []
    for _ in range(24):
        n = int(rng.integers(4, 40))
        t = rng.integers(0, 4, n).astype(np.uint8)
        q = mutate(rng, t, int(rng.integers(0, 6)))
        if len(q) == 0 or abs(len(t) - len(q)) + 1 > W:
            q = t.copy()
        pairs.append((q, t))
    res, gs, m_len, n_len, lo = run_batch(pairs, M, W, scores)
    dirs = np.asarray(res["dirs"])
    for b, (q, t) in enumerate(pairs):
        lo_b = int(lo[b])
        hi_b = lo_b + W - 1
        exp_score, exp_cig = oracle.banded_global(q, t, scores, lo_b, hi_b)
        assert int(gs[b]) == exp_score, f"instance {b}"
        cig = traceback_banded(dirs[b], lo_b, len(q), len(t))
        assert cig == exp_cig, f"instance {b}: {cig} != {exp_cig}"


def test_global_identical_sequences(rng):
    W, M = 32, 40
    t = rng.integers(0, 4, 33).astype(np.uint8)
    res, gs, *_ = run_batch([(t.copy(), t)], M, W, S)
    assert int(gs[0]) == 33 * S.match


def test_global_with_n_bases(rng):
    W, M = 16, 24
    t = rng.integers(0, 4, 20).astype(np.uint8)
    q = t.copy()
    q[5] = 4  # N in query
    t2 = t.copy()
    t2[10] = 4  # N in target
    res, gs, m_len, n_len, lo = run_batch([(q, t), (t.copy(), t2)], M, W, S)
    for b, (qq, tt) in enumerate([(q, t), (t, t2)]):
        exp, _ = oracle.banded_global(qq, tt, S, int(lo[b]),
                                      int(lo[b]) + W - 1)
        assert int(gs[b]) == exp


def test_extend_matches_oracle_random(rng):
    W, M = 32, 48
    pairs = []
    for _ in range(16):
        n = int(rng.integers(8, 40))
        t = rng.integers(0, 4, n).astype(np.uint8)
        m = int(rng.integers(4, 40))
        # prefix-related query: half derived from t, half random
        q = mutate(rng, t[:min(m, n)], 3)
        if len(q) == 0:
            q = t[:4].copy()
        if abs(len(t) - len(q)) + 1 > W:
            q = t[:n].copy()
        pairs.append((q, t))
    res, gs, m_len, n_len, lo = run_batch(pairs, M, W, S)
    best = np.asarray(res["best"])
    dirs = np.asarray(res["dirs"])
    h_last = np.asarray(res["h_last"])
    for b, (q, t) in enumerate(pairs):
        lo_b = int(lo[b])
        r = oracle.banded_extend(q, t, S, lo_b, lo_b + W - 1)
        exp_score, exp_i, exp_j = r["best"]
        got_score, got_i, got_d = (int(best[b, 0]), int(best[b, 1]),
                                   int(best[b, 2]))
        got_j = got_i + lo_b + got_d
        assert (got_score, got_i, got_j) == (exp_score, exp_i, exp_j), b
        cig = traceback_banded(dirs[b], lo_b, got_i, got_j)
        assert cig == r["cigar_best"], b
        # to_end from last row
        if r["to_end"] is not None:
            valid = np.array([0 <= len(q) + lo_b + d <= len(t)
                              for d in range(W)])
            row = np.where(valid, h_last[b], oracle.NEG_INF)
            te_d = int(np.argmax(row))
            te_j = len(q) + lo_b + te_d
            assert (int(row[te_d]), te_j) == r["to_end"], b


def test_empty_query_instance():
    W, M = 16, 24
    t = np.array([0, 1, 2, 3], np.uint8)
    # m=0: h_last must be the init row; global score = gap over whole t
    res, gs, *_ = run_batch([(np.zeros(0, np.uint8), t)], M, W, S)
    assert int(gs[0]) == -(S.gap_open + 4 * S.gap_ext)


def test_large_band_bucket(rng):
    # exercise a realistic bucket shape: W=128 lanes, M=256 rows
    W, M = 128, 256
    t = rng.integers(0, 4, 250).astype(np.uint8)
    q = mutate(rng, t, 25)
    res, gs, m_len, n_len, lo = run_batch([(q, t)], M, W, S)
    exp, exp_cig = oracle.banded_global(q, t, S, int(lo[0]),
                                        int(lo[0]) + W - 1)
    assert int(gs[0]) == exp
    cig = traceback_banded(np.asarray(res["dirs"])[0], int(lo[0]),
                           len(q), len(t))
    assert cig == exp_cig


def test_zdrop_matches_oracle(rng):
    """XLA kernel with per-instance zdrop == oracle banded_extend with
    the same zdrop (best cell + h_last availability)."""
    from lamsa_tpu.ops.banded_sw_xla import (banded_sw_batch, make_t_window)
    from lamsa_tpu.ops.oracle import NEG_INF, banded_extend

    S = ScoreParams()
    M, W = 512, 128
    B = 8
    q = np.zeros((B, M), np.int32)
    t_win = np.zeros((B, M + W), np.int32)
    m_len = np.zeros(B, np.int32)
    n_len = np.zeros(B, np.int32)
    lo = np.full(B, -(W // 2), np.int32)
    zdrop = np.zeros(B, np.int32)
    ts = []
    for b in range(B):
        n = int(rng.integers(300, 480))
        t = rng.integers(0, 4, n).astype(np.uint8)
        qq = t.copy()
        # corrupt a random interior window to force score dips
        a = int(rng.integers(100, 200))
        ln = int(rng.integers(16, 80))
        qq[a:a + ln] = (qq[a:a + ln] + 1 + rng.integers(0, 3, ln)) % 4
        m_len[b] = n_len[b] = n
        q[b, :n] = qq
        t_win[b] = make_t_window(t, int(lo[b]), M, W)
        zdrop[b] = int(rng.choice([0, 30, 60, 100]))
        ts.append((qq, t))
    res = banded_sw_batch(q, t_win, m_len, n_len, lo, zdrop,
                          match=S.match, mismatch=S.mismatch,
                          gapo=S.gap_open, gape=S.gap_ext)
    best = np.asarray(res["best"])
    h_last = np.asarray(res["h_last"])
    for b in range(B):
        qq, t = ts[b]
        o = banded_extend(qq, t, S, band_lo=int(lo[b]),
                          band_hi=int(lo[b]) + W - 1, zdrop=int(zdrop[b]))
        assert tuple(best[b]) == (o["best"][0], o["best"][1],
                                  o["best"][2] - o["best"][1] - int(lo[b])), b
        if o["to_end"] is None:
            assert h_last[b].max() <= NEG_INF, b
        else:
            d = np.arange(W) + int(m_len[b]) + int(lo[b])
            row = np.where((d >= 0) & (d <= int(n_len[b])), h_last[b],
                           NEG_INF)
            assert row.max() == o["to_end"][0], b
