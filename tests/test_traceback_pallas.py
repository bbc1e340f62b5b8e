"""On-device traceback kernel (interpret mode) vs host traceback:
decoded CIGARs must be identical for global and extend walks."""

import numpy as np

from lamsa_tpu.config import ScoreParams
from lamsa_tpu.ops.banded_sw_xla import (banded_sw_batch, make_t_window,
                                         prepare_band)
from lamsa_tpu.ops.traceback import decode_steps, traceback_banded
from lamsa_tpu.ops.traceback_pallas import traceback_pallas
from tests.test_banded_sw_pallas import make_batch

S = ScoreParams()
KW = dict(match=S.match, mismatch=S.mismatch, gapo=S.gap_open,
          gape=S.gap_ext)


def pack_dirs(dirs_u8: np.ndarray) -> np.ndarray:
    """uint8[B, M, W] -> packed int32[B, M/4, W] (inverse of
    unpack_dirs)."""
    B, M, W = dirs_u8.shape
    d = dirs_u8.reshape(B, M // 4, 4, W).astype(np.uint32)
    word = (d[:, :, 0] | (d[:, :, 1] << 8) | (d[:, :, 2] << 16)
            | (d[:, :, 3] << 24))
    return word.view(np.int32)


def test_traceback_global_matches_host(rng):
    B, M, W = 16, 128, 128
    q, t_win, m_len, n_len, lo = make_batch(rng, B, M, W)
    res = banded_sw_batch(q, t_win, m_len, n_len, lo, **KW)
    dirs = np.asarray(res["dirs"])
    dirs32 = pack_dirs(dirs)

    start_i = m_len.copy()
    start_d = n_len - m_len - lo
    steps, term = traceback_pallas(dirs32, m_len, n_len, lo, start_i,
                                   start_d, interpret=True)
    steps, term = np.asarray(steps), np.asarray(term)
    for b in range(B):
        want = traceback_banded(dirs[b], int(lo[b]), int(m_len[b]),
                                int(n_len[b]))
        got = decode_steps(steps[b], term[b], int(start_i[b]))
        assert got == want, f"instance {b}: {got[:6]}... != {want[:6]}..."


def test_traceback_extend_and_edge_cases(rng):
    B, M, W = 16, 128, 128
    q, t_win, m_len, n_len, lo = make_batch(rng, B, M, W)
    res = banded_sw_batch(q, t_win, m_len, n_len, lo, **KW)
    dirs = np.asarray(res["dirs"])
    best = np.asarray(res["best"])
    dirs32 = pack_dirs(dirs)

    # walk from the extend best cell instead of (m, n)
    start_i = best[:, 1].astype(np.int32)
    start_d = best[:, 2].astype(np.int32)
    # instance 2: start at row 0 (empty walk; pure terminal D)
    start_i[2] = 0
    start_d[2] = -lo[2] + 3 if -lo[2] + 3 < W else 0
    steps, term = traceback_pallas(dirs32, m_len, n_len, lo, start_i,
                                   start_d, interpret=True)
    steps, term = np.asarray(steps), np.asarray(term)
    for b in range(B):
        i, d = int(start_i[b]), int(start_d[b])
        j = i + int(lo[b]) + d
        want = traceback_banded(dirs[b], int(lo[b]), i, j)
        got = decode_steps(steps[b], term[b], i)
        assert got == want, f"instance {b}"
