"""Oracle self-consistency tests: the NumPy banded affine DP must agree
with brute-force alignment enumeration on tiny cases and satisfy CIGAR
invariants on random cases."""

import numpy as np
import pytest

from lamsa_tpu.config import ScoreParams
from lamsa_tpu.io.sam import OP_D, OP_I, OP_M, cigar_query_len, cigar_ref_len
from lamsa_tpu.ops import oracle

S = ScoreParams(match=1, mismatch=3, gap_open=5, gap_ext=2)


def brute_force_global(q, t, scores):
    """Exponential enumeration of alignments for tiny inputs."""
    match, mismatch, gapo, gape = scores.as_tuple()
    from functools import lru_cache
    import sys
    sys.setrecursionlimit(100000)

    @lru_cache(maxsize=None)
    def go(i, j, state):
        # state: 0=H (free), 1=in E gap, 2=in F gap
        if i == 0 and j == 0:
            return 0 if state == 0 else -10**9
        best = -10**9
        if i > 0 and j > 0 and state == 0:
            s = match if (q[i - 1] == t[j - 1] and q[i - 1] < 4) else -mismatch
            best = max(best, go(i - 1, j - 1, 0) + s)
        if j > 0 and (state in (0, 1)):
            # arriving via a horizontal gap char
            open_cost = gapo if state == 0 else 0
            prev = max(go(i, j - 1, 0) - gapo - gape, go(i, j - 1, 1) - gape)
            if state == 0:
                best = max(best, prev)
            else:
                best = max(best, prev + gapo - open_cost)  # same expr
        if i > 0 and state in (0, 2):
            prev = max(go(i - 1, j, 0) - gapo - gape, go(i - 1, j, 2) - gape)
            best = max(best, prev)
        return best

    # cleaner: classic 3-matrix DP as independent implementation
    m, n = len(q), len(t)
    NEG = -10**9
    H = [[NEG] * (n + 1) for _ in range(m + 1)]
    E = [[NEG] * (n + 1) for _ in range(m + 1)]
    F = [[NEG] * (n + 1) for _ in range(m + 1)]
    H[0][0] = 0
    for j in range(1, n + 1):
        E[0][j] = -(gapo + j * gape)
        H[0][j] = E[0][j]
    for i in range(1, m + 1):
        F[i][0] = -(gapo + i * gape)
        H[i][0] = F[i][0]
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            E[i][j] = max(H[i][j - 1] - gapo, E[i][j - 1]) - gape
            F[i][j] = max(H[i - 1][j] - gapo, F[i - 1][j]) - gape
            s = match if (q[i - 1] == t[j - 1] and q[i - 1] < 4) else -mismatch
            H[i][j] = max(H[i - 1][j - 1] + s, E[i][j], F[i][j])
    return H[m][n]


def check_cigar(q, t, cig, score, scores):
    """CIGAR consumes exactly q and t and re-derives the same score."""
    match, mismatch, gapo, gape = scores.as_tuple()
    assert cigar_query_len(cig) == len(q)
    assert cigar_ref_len(cig) == len(t)
    i = j = 0
    s = 0
    for op, ln in cig:
        if op == OP_M:
            for _ in range(ln):
                s += match if (q[i] == t[j] and q[i] < 4) else -mismatch
                i += 1
                j += 1
        elif op == OP_I:
            s -= gapo + ln * gape
            i += ln
        elif op == OP_D:
            s -= gapo + ln * gape
            j += ln
    assert s == score, f"cigar rederived score {s} != DP score {score}"


@pytest.mark.parametrize("qs,ts", [
    ("ACGT", "ACGT"),
    ("ACGT", "AGT"),
    ("AGT", "ACGT"),
    ("ACGTACGT", "ACTTACGG"),
    ("AAAA", "TTTT"),
    ("A", "ACGTACGT"),
    ("ACGTACGT", "A"),
    ("", "ACG"),
    ("ACG", ""),
    ("ACGTN", "ACGTA"),
])
def test_global_matches_independent_dp(qs, ts):
    from lamsa_tpu.io.fasta import encode_seq
    q = np.frombuffer(encode_seq(qs), np.uint8)
    t = np.frombuffer(encode_seq(ts), np.uint8)
    score, cig = oracle.banded_global(q, t, S)
    expected = brute_force_global(list(q), list(t), S)
    assert score == expected
    check_cigar(q, t, cig, score, S)


def test_global_random_fullband_vs_independent(rng):
    for _ in range(30):
        m = int(rng.integers(1, 40))
        n = int(rng.integers(1, 40))
        q = rng.integers(0, 4, m).astype(np.uint8)
        t = rng.integers(0, 4, n).astype(np.uint8)
        score, cig = oracle.banded_global(q, t, S)
        assert score == brute_force_global(list(q), list(t), S)
        check_cigar(q, t, cig, score, S)


def test_banded_equals_full_when_band_wide(rng):
    for _ in range(20):
        m = int(rng.integers(5, 60))
        # similar-length target
        n = m + int(rng.integers(-3, 4))
        if n < 1:
            n = 1
        q = rng.integers(0, 4, m).astype(np.uint8)
        t = q[:n].copy() if n <= m else np.concatenate(
            [q, rng.integers(0, 4, n - m).astype(np.uint8)])
        lo = min(0, n - m) - 10
        hi = max(0, n - m) + 10
        s1, c1 = oracle.banded_global(q, t, S)
        s2, c2 = oracle.banded_global(q, t, S, lo, hi)
        # wide-enough band must match full DP on near-diagonal alignments
        assert s2 == s1
        check_cigar(q, t, c2, s2, S)


def test_extend_identical_prefix(rng):
    q = rng.integers(0, 4, 50).astype(np.uint8)
    t = np.concatenate([q, rng.integers(0, 4, 30).astype(np.uint8)])
    r = oracle.banded_extend(q, t, S)
    score, qe, te = r["best"]
    assert score == 50 * S.match
    assert qe == 50 and te == 50
    assert r["to_end"][0] == score
    check_prefix_cigar(q, t, r["cigar_best"], qe, te)


def check_prefix_cigar(q, t, cig, qe, te):
    assert cigar_query_len(cig) == qe
    assert cigar_ref_len(cig) == te


def test_extend_clip_decision_case(rng):
    # good 30bp match then garbage: best cell should stop near 30
    q = np.concatenate([rng.integers(0, 4, 30).astype(np.uint8),
                        np.full(20, 0, np.uint8)])
    t = np.concatenate([q[:30], np.full(40, 3, np.uint8)])
    r = oracle.banded_extend(q, t, S)
    score, qe, te = r["best"]
    assert qe == 30 and te == 30
    assert score == 30
    # consuming the whole query costs mismatches
    assert r["to_end"][0] < score


def test_zdrop_group_semantics():
    """zdrop freezes best/to_end at the first ZDROP_GROUP boundary whose
    row max dropped > zdrop below the running best (SURVEY.md section
    3.4 ksw_extend termination)."""
    from lamsa_tpu.config import ScoreParams
    from lamsa_tpu.ops.oracle import banded_extend

    S = ScoreParams()
    rng = np.random.default_rng(3)
    t = rng.integers(0, 4, 456).astype(np.uint8)
    q = t.copy()
    q[224:256] = 4                     # 32 N rows: never match anything
    # cheapest crossing of the N block at row 256 is a 32-insertion
    # (gapo + 32*gape = 69), so the boundary-256 drop is exactly 69;
    # the full-query path is 424 matches - 32 N-mismatches = 328
    res_off = banded_extend(q, t, S, band_lo=-64, band_hi=63, zdrop=0)
    assert res_off["zstop"] is None
    assert res_off["best"][0] == 456 - 32 * (1 + S.mismatch)  # 328
    assert res_off["to_end"][0] == res_off["best"][0]
    res_on = banded_extend(q, t, S, band_lo=-64, band_hi=63, zdrop=50)
    assert res_on["zstop"] == 256
    assert res_on["best"] == (224, 224, 224)
    assert res_on["to_end"] is None
    # the 69-drop survives zdrop=100 (checks only at group boundaries)
    res_hi = banded_extend(q, t, S, band_lo=-64, band_hi=63, zdrop=100)
    assert res_hi["zstop"] is None
    assert res_hi["best"][0] == 328
