"""Antidiagonal-wavefront kernel (interpret mode) vs the XLA spec:
bit-identical direction nibbles, h_last, and walker CIGARs.

The adiag engine handles GLOBAL instances with EVEN band lo
(ops/banded_sw.py::global_lo); these tests build such instances with
indels, N codes, and varying lengths/bands."""

import numpy as np
import pytest

from lamsa_tpu.config import ScoreParams
from lamsa_tpu.io.sam import OP_D, OP_I, OP_M
from lamsa_tpu.ops.banded_sw import compact_wide
from lamsa_tpu.ops.banded_sw_adiag import (banded_sw_adiag,
                                           traceback_adiag,
                                           unpack_dirs_adiag)
from lamsa_tpu.ops.banded_sw_xla import banded_sw_batch, make_t_window
from lamsa_tpu.ops.traceback import traceback_banded

S = ScoreParams()
KW = dict(match=S.match, mismatch=S.mismatch, gapo=S.gap_open,
          gape=S.gap_ext)


def make_globals(rng, B, M, W):
    """Random global instances (mutated copies, N codes) with even lo."""
    q = np.zeros((B, M), np.int32)
    t_win = np.zeros((B, M + W), np.int32)
    m_len = np.zeros(B, np.int32)
    n_len = np.zeros(B, np.int32)
    lo = np.zeros(B, np.int32)
    for b in range(B):
        m = int(rng.integers(1, M + 1))
        t = rng.integers(0, 5, m).astype(np.int32)      # incl. N = 4
        ql = list(t)
        for _ in range(int(rng.integers(0, max(2, m // 12)))):
            k = int(rng.integers(0, max(1, len(ql))))
            r = rng.random()
            if r < 0.4 and ql:
                ql[k] = int(rng.integers(0, 4))
            elif r < 0.7:
                ql.insert(k, int(rng.integers(0, 4)))
            elif ql:
                del ql[k]
        qq = np.array(ql[:M], np.int32)
        if len(qq) == 0:
            qq = t[:1].copy()
        n = len(t)
        need = abs(n - len(qq)) + 1
        if need > W - 2:
            qq = t.copy()
        lob = min(0, n - len(qq)) - (W - (abs(n - len(qq)) + 1)) // 2
        lob -= lob & 1                                  # even-lo contract
        m_len[b], n_len[b] = len(qq), n
        lo[b] = lob
        q[b, :len(qq)] = qq
        t_win[b] = make_t_window(t, lob, M, W)
    return q, t_win, m_len, n_len, lo


def decode_topdown(opbits_row, events_words, term0, start_i, n_ev, wide):
    """Row-descending-slot compact decode (numpy spec of the adiag
    walker's wire; production reverses slots and reuses the shared
    native decoder)."""
    if wide:
        evs = [int(w) for w in events_words]
        rsh, cmask = 13, 8191
    else:
        evs = []
        for w in events_words:
            w = int(w) & 0xFFFFFFFF
            evs.extend([w & 0xFFFF, (w >> 16) & 0xFFFF])
        rsh, cmask = 5, 31
    ops = []

    def push(op, ln):
        if ln <= 0:
            return
        if ops and ops[-1][0] == op:
            ops[-1][1] += ln
        else:
            ops.append([op, ln])

    ptr = 0
    for r in range(int(start_i), 0, -1):
        idx = r - 1
        if ptr < n_ev and (evs[ptr] >> rsh) == idx:
            push(OP_D, evs[ptr] & cmask)
            ptr += 1
        bit = (int(opbits_row[idx >> 5]) >> (idx & 31)) & 1
        push(OP_I if bit else OP_M, 1)
    push(OP_D, int(term0))
    return [(op, ln) for op, ln in reversed(ops)]


@pytest.mark.parametrize("M,W", [(128, 256), (512, 256), (128, 128),
                                 (512, 128)])
def test_adiag_matches_xla(rng, M, W):
    B = 16
    q, t_win, m_len, n_len, lo = make_globals(rng, B, M, W)
    ref = banded_sw_batch(q, t_win, m_len, n_len, lo, **KW)
    got = banded_sw_adiag(q, t_win, m_len, n_len, lo, interpret=True,
                          **KW)
    FLOOR = -20000
    np.testing.assert_array_equal(
        np.maximum(np.asarray(got["h_last"]), FLOOR),
        np.maximum(np.asarray(ref["h_last"]), FLOOR))
    gd = unpack_dirs_adiag(np.asarray(got["dirs32a"]), m_len, n_len, lo,
                           M, W)
    rd = np.asarray(ref["dirs"])
    for b in range(B):
        mb = int(m_len[b])
        np.testing.assert_array_equal(gd[b, :mb], rd[b, :mb],
                                      err_msg=f"instance {b}")


@pytest.mark.parametrize("M,W", [(128, 256), (512, 256), (128, 128),
                                 (512, 128)])
def test_adiag_walker_matches_host_traceback(rng, M, W):
    B = 16
    q, t_win, m_len, n_len, lo = make_globals(rng, B, M, W)
    ref = banded_sw_batch(q, t_win, m_len, n_len, lo, **KW)
    got = banded_sw_adiag(q, t_win, m_len, n_len, lo, interpret=True,
                          **KW)
    sd = (n_len - m_len - lo).astype(np.int32)
    hl = (lo >> 1).astype(np.int32)
    opb, ev, term0, n_ev = traceback_adiag(
        np.asarray(got["dirs32a"]), m_len.astype(np.int32), sd, hl,
        M=M, interpret=True)
    opb, ev = np.asarray(opb), np.asarray(ev)
    term0, n_ev = np.asarray(term0), np.asarray(n_ev)
    rd = np.asarray(ref["dirs"])
    wide = compact_wide(M)
    decoded = 0
    for b in range(B):
        m, n, lob = int(m_len[b]), int(n_len[b]), int(lo[b])
        want = traceback_banded(rd[b], lob, m, n)
        if int(n_ev[b]) == 0xFFFF:
            continue                    # overflow -> host recompute path
        got_cig = decode_topdown(opb[b], ev[b], int(term0[b]), m,
                                 int(n_ev[b]), wide)
        assert got_cig == want, f"instance {b}"
        decoded += 1
    assert decoded >= B - 2             # overflow must stay rare


def test_adiag_fused_wire_and_collect(rng):
    """Full adiag production chain on CPU (interpret): DP -> walker ->
    compact wire -> topdown collect -> native decode must reproduce the
    XLA engine's scores and CIGARs exactly."""
    from lamsa_tpu import native
    from lamsa_tpu.ops.banded_sw import (_dp_tb_adiag_core,
                                         collect_group_pallas,
                                         run_group_xla)

    M, W, B = 256, 256, 16
    q, t_win, m_len, n_len, lo = make_globals(rng, B, M, W)
    wire = np.asarray(_dp_tb_adiag_core(
        q, t_win, m_len, n_len, lo, M=M, interpret=True, **KW))
    cigars, score, si, sd = collect_group_pallas(wire, M, topdown=True)

    out, cigar_fn = run_group_xla(q, t_win, m_len, n_len, lo, S)
    for b in range(B):
        m, n = int(m_len[b]), int(n_len[b])
        assert int(score[b]) == int(out["global_score"][b]), f"inst {b}"
        assert int(si[b]) == m and int(si[b]) + int(lo[b]) + int(sd[b]) == n
        want = native.cigar_to_runs(cigar_fn(b, m, n))
        got = cigars[b]
        if got is None:                     # device event overflow
            continue
        np.testing.assert_array_equal(got, want, err_msg=f"inst {b}")


def test_adiag_walker_wide_events(rng):
    """M > 2048 buckets use wide 32-bit walker events ((row << 13) |
    cnt); exercised here so the 5120 bucket can ungate from the row
    engine (extend._adiag_bucket) once its TPU compile is validated."""
    M, W, B = 2176, 256, 8
    q, t_win, m_len, n_len, lo = make_globals(rng, B, M, W)
    ref = banded_sw_batch(q, t_win, m_len, n_len, lo, **KW)
    got = banded_sw_adiag(q, t_win, m_len, n_len, lo, interpret=True,
                          **KW)
    sd = (n_len - m_len - lo).astype(np.int32)
    opb, ev, term0, n_ev = traceback_adiag(
        np.asarray(got["dirs32a"]), m_len.astype(np.int32), sd,
        (lo >> 1).astype(np.int32), M=M, interpret=True)
    opb, ev = np.asarray(opb), np.asarray(ev)
    term0, n_ev = np.asarray(term0), np.asarray(n_ev)
    rd = np.asarray(ref["dirs"])
    assert compact_wide(M)
    for b in range(B):
        m, n, lob = int(m_len[b]), int(n_len[b]), int(lo[b])
        if int(n_ev[b]) == 0xFFFF:
            continue
        want = traceback_banded(rd[b], lob, m, n)
        gotc = decode_topdown(opb[b], ev[b], int(term0[b]), m,
                              int(n_ev[b]), True)
        assert gotc == want, f"instance {b}"
