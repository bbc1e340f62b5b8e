"""Pallas kernel (interpret mode on CPU) vs XLA kernel: must be
bit-identical — same scores, same direction bytes."""

import numpy as np
import pytest

from lamsa_tpu.config import ScoreParams
from lamsa_tpu.ops.banded_sw_pallas import banded_sw_pallas, unpack_dirs
from lamsa_tpu.ops.banded_sw_xla import (banded_sw_batch, make_t_window,
                                         prepare_band)

S = ScoreParams()


def make_batch(rng, B, M, W, n_range=(8, None)):
    n_hi = n_range[1] or (M - 2)
    q = np.zeros((B, M), np.int32)
    t_win = np.zeros((B, M + W), np.int32)
    m_len = np.zeros(B, np.int32)
    n_len = np.zeros(B, np.int32)
    lo = np.zeros(B, np.int32)
    for b in range(B):
        n = int(rng.integers(n_range[0], n_hi))
        t = rng.integers(0, 4, n).astype(np.uint8)
        # mutated copy as query
        q_list = list(t)
        for _ in range(int(rng.integers(0, max(2, n // 8)))):
            k = int(rng.integers(0, max(1, len(q_list))))
            r = rng.random()
            if r < 0.4 and q_list:
                q_list[k] = int(rng.integers(0, 4))
            elif r < 0.7:
                q_list.insert(k, int(rng.integers(0, 4)))
            elif q_list:
                del q_list[k]
        qq = np.array(q_list[:M], np.uint8)
        if len(qq) == 0 or abs(n - len(qq)) + 1 > W - 8:
            qq = t[:M].copy()
        m_len[b], n_len[b] = len(qq), n
        lo[b] = prepare_band(len(qq), n, W)
        q[b, :len(qq)] = qq
        t_win[b] = make_t_window(t, int(lo[b]), M, W)
    return q, t_win, m_len, n_len, lo


@pytest.mark.parametrize("M,W", [(128, 128), (256, 256), (512, 256)])
def test_pallas_interpret_matches_xla(rng, M, W):
    B = 16
    q, t_win, m_len, n_len, lo = make_batch(rng, B, M, W)
    kw = dict(match=S.match, mismatch=S.mismatch, gapo=S.gap_open,
              gape=S.gap_ext)
    ref = banded_sw_batch(q, t_win, m_len, n_len, lo, **kw)
    got = banded_sw_pallas(q, t_win, m_len, n_len, lo, interpret=True, **kw)
    # int16 engine floors dead lanes at -30000 vs the int32 spec's -2^29;
    # live scores are far above either floor — compare through a common
    # floor (shared contract: only in-band values are meaningful)
    FLOOR = -20000
    np.testing.assert_array_equal(
        np.maximum(np.asarray(got["h_last"]), FLOOR),
        np.maximum(np.asarray(ref["h_last"]), FLOOR))
    np.testing.assert_array_equal(np.asarray(got["best"]),
                                  np.asarray(ref["best"]))
    got_dirs = unpack_dirs(np.asarray(got["dirs32"]))
    ref_dirs = np.asarray(ref["dirs"])
    # dirs above each tile's max query length are unspecified (the
    # kernel skips those row groups); compare the meaningful rows only
    for b in range(B):
        mb = int(m_len[b])
        np.testing.assert_array_equal(got_dirs[b, :mb], ref_dirs[b, :mb],
                                      err_msg=f"instance {b}")


def test_pallas_interpret_empty_and_padded(rng):
    B, M, W = 16, 128, 128
    q, t_win, m_len, n_len, lo = make_batch(rng, B, M, W)
    # instance 3: empty query; instance 5: m_len 1
    m_len[3], n_len[3], lo[3] = 0, 5, 0
    t_win[3] = make_t_window(np.array([0, 1, 2, 3, 0], np.uint8), 0, M, W)
    kw = dict(match=S.match, mismatch=S.mismatch, gapo=S.gap_open,
              gape=S.gap_ext)
    ref = banded_sw_batch(q, t_win, m_len, n_len, lo, **kw)
    got = banded_sw_pallas(q, t_win, m_len, n_len, lo, interpret=True, **kw)
    FLOOR = -20000
    np.testing.assert_array_equal(
        np.maximum(np.asarray(got["h_last"]), FLOOR),
        np.maximum(np.asarray(ref["h_last"]), FLOOR))
    got_dirs = unpack_dirs(np.asarray(got["dirs32"]))
    ref_dirs = np.asarray(ref["dirs"])
    for b in range(B):
        mb = int(m_len[b])
        np.testing.assert_array_equal(got_dirs[b, :mb], ref_dirs[b, :mb],
                                      err_msg=f"instance {b}")


def test_pallas_zdrop_matches_xla(rng):
    """Per-instance zdrop termination: pallas (interpret) == XLA on
    best cell and h_last (dirs may legitimately diverge in fully
    skipped row groups, which traceback never reads)."""
    M, W = 512, 128
    B = 16
    q = np.zeros((B, M), np.int32)
    t_win = np.zeros((B, M + W), np.int32)
    m_len = np.zeros(B, np.int32)
    n_len = np.zeros(B, np.int32)
    lo = np.full(B, -(W // 2), np.int32)
    zdrop = np.zeros(B, np.int32)
    for b in range(B):
        n = int(rng.integers(300, 480))
        t = rng.integers(0, 4, n).astype(np.uint8)
        qq = t.copy()
        a = int(rng.integers(64, 200))
        ln = int(rng.integers(16, 96))
        qq[a:a + ln] = 4                      # N block forces a dip
        m_len[b] = n_len[b] = n
        q[b, :n] = qq
        t_win[b] = make_t_window(t, int(lo[b]), M, W)
        zdrop[b] = int(rng.choice([0, 30, 60, 150]))
    kw = dict(match=S.match, mismatch=S.mismatch, gapo=S.gap_open,
              gape=S.gap_ext)
    ref = banded_sw_batch(q, t_win, m_len, n_len, lo, zdrop, **kw)
    got = banded_sw_pallas(q, t_win, m_len, n_len, lo, zdrop,
                           interpret=True, **kw)
    FLOOR = -20000
    np.testing.assert_array_equal(
        np.maximum(np.asarray(got["h_last"]), FLOOR),
        np.maximum(np.asarray(ref["h_last"]), FLOOR))
    np.testing.assert_array_equal(np.asarray(got["best"]),
                                  np.asarray(ref["best"]))
