"""FM-index build + host query correctness."""

import numpy as np
import pytest

from lamsa_tpu.index.fmindex import SA_RATE, FmIndex, substitute_n


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, 20000).astype(np.uint8)
    fm = FmIndex.build(codes)
    return codes, fm


def brute_occurrences(codes, piece):
    n, k = len(codes), len(piece)
    return sorted(i for i in range(n - k + 1)
                  if np.array_equal(codes[i:i + k], piece))


def test_backward_search_random_pieces(world, rng):
    codes, fm = world
    for _ in range(25):
        k = int(rng.integers(4, 18))
        s = int(rng.integers(0, len(codes) - k))
        piece = codes[s:s + k]
        lo, hi = fm.backward_search(piece)
        want = brute_occurrences(codes, piece)
        assert hi - lo == len(want), (s, k)
        got = sorted(fm.resolve_row(r) for r in range(lo, hi))
        assert got == want, (s, k)


def test_backward_search_absent_piece(world):
    codes, fm = world
    # piece longer than any repeat with a mismatch forced
    piece = codes[100:125].copy()
    piece[12] = (piece[12] + 1) % 4
    lo, hi = fm.backward_search(piece)
    want = brute_occurrences(codes, piece)
    assert hi - lo == len(want)


def test_resolve_every_rate_boundary(world):
    codes, fm = world
    # rows just around sampled rows and the primary
    for row in [0, 1, SA_RATE - 1, SA_RATE, SA_RATE + 1, fm.primary,
                fm.primary + 1 if fm.primary + 1 <= fm.n else fm.primary,
                fm.n]:
        pos = fm.resolve_row(row)
        assert 0 <= pos <= fm.n


def test_repetitive_text():
    codes = np.tile(np.array([0, 1, 2, 3, 0, 1], np.uint8), 500)
    fm = FmIndex.build(codes)
    piece = np.array([0, 1, 2, 3], np.uint8)
    lo, hi = fm.backward_search(piece)
    want = brute_occurrences(codes, piece)
    assert hi - lo == len(want)
    got = sorted(fm.resolve_row(r) for r in range(lo, hi))
    assert got == want


def test_substitute_n_deterministic():
    codes = np.array([0, 4, 2, 4, 4, 1], np.uint8)
    a = substitute_n(codes)
    b = substitute_n(codes)
    assert np.array_equal(a, b)
    assert (a < 4).all()
    assert a[0] == 0 and a[2] == 2 and a[5] == 1


def test_save_load(tmp_path, world):
    codes, fm = world
    fm.save(str(tmp_path))
    fm2 = FmIndex.load(str(tmp_path))
    assert fm2.n == fm.n and fm2.primary == fm.primary
    for a, b in [(fm.bwt2, fm2.bwt2), (fm.occ, fm2.occ),
                 (fm.ssa_marks, fm2.ssa_marks),
                 (fm.ssa_pos, fm2.ssa_pos), (fm.C, fm2.C)]:
        assert np.array_equal(a, b)
    piece = codes[500:515]
    assert fm2.backward_search(piece) == fm.backward_search(piece)


def test_chunked_build_matches_unchunked(monkeypatch, rng):
    """Shrink the build chunk sizes so the text spans many chunks; all
    structures must match the single-chunk build. Length chosen so the
    final chunk has nr % 64 in [1, 32] (the padded mark word would
    overflow the bitvector by one word without clipping — the GRCh38
    3.1e9+1 case)."""
    from lamsa_tpu.index import fmindex as fmi
    codes = rng.integers(0, 4, 16384 + 64).astype(np.uint8)  # nr%64 == 1
    big = fmi.FmIndex.build(codes)
    monkeypatch.setattr(fmi, "_OCC_CHUNK", 4096)
    monkeypatch.setattr(fmi, "_SSA_CHUNK", 8192)
    small = fmi.FmIndex.build(codes)
    for name in ["bwt2", "occ", "ssa_marks", "ssa_rankcp", "ssa_pos"]:
        assert np.array_equal(getattr(big, name), getattr(small, name)), name
    piece = codes[777:793]
    assert small.backward_search(piece) == big.backward_search(piece)
    lo, hi = small.backward_search(piece)
    assert [small.resolve_row(r) for r in range(lo, hi)] == \
        [big.resolve_row(r) for r in range(lo, hi)]
