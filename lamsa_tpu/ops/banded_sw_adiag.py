"""Antidiagonal-wavefront banded SW for GLOBAL gap fills — Pallas TPU.

Why a second DP kernel: the rolling-ROW kernel (banded_sw_pallas.py)
resolves the in-row affine-E dependency with an exclusive prefix-max —
log2(W) = 8 lane rotates per row — plus 2 state up-shifts and 2
amortized q/t rotates: ~14 rotate ops per W-cell row. Measured on this
v5e (2026-08-20 microbench, BASELINE.md), a lane rotate sustains only
~0.45e12 elem/s vs ~3.85e12 for int32 ALU ops — rotates are ~8x ALU
cost and dominate the kernel (the reason it measures ~26 Gcells/s
against an 86-ALU-op/cell "45 Gcells/s" model).

In ANTIDIAGONAL order both E and F become cross-step dependencies —
no scan at all. Step a computes every in-band cell (i, j) with
i + j == a. With the band in diagonal coordinates d = j - i - lo
(lo EVEN, enforced by the caller), d on antidiag a has fixed parity
(a & 1), so lane l holds d = 2l + (a & 1) and V = W/2 lanes cover the
band (V = 128 at W = 256: exactly one vreg row). Geometry per instance
(hl = lo/2 <= 0, u = a >> 1, par = a & 1):

    i = (u - hl) - l          j = (u + par + hl) + l

Sources of cell (i, j) at step a, in lanes of steps a-1 / a-2:
    diag (i-1, j-1): lane l, step a-2           (never shifts)
    E    (i,   j-1): lane l-1 on EVEN a, lane l on odd a
    F    (i-1, j  ): lane l+1 on ODD  a, lane l on even a

so each step rotates exactly TWO arrays by one lane (h + e, or h + f)
— 2 rotates/step + 2 static q/t window rolls vs the row kernel's ~14.

E recurrence (exact, proven equal to the spec's prefix-max form
including the tie bit — see _step comments):
    E'[d] = max(E[d-1], H[d-1] - gapo) - gape        (UNclamped chain)
    ebit[d] = E[d-1] >= H[d-1] - gapo
with H the stored (clamped+masked) row value; chain fill at d == 0 is
NEG - gapo + gape and ebit is forced 0 there. F mirrors the row spec.

This kernel handles GLOBAL instances only (interior gap fills — the
bulk of production DP cells): no zdrop, no best-cell tracking, no
to-end machinery — the outputs are the packed direction words (step
layout), h_last (captured lane-by-lane as the wavefront crosses row m)
and thus the global score H[m][n]. Extensions keep the row kernel.

Direction NIBBLE semantics are bit-identical to ops/oracle.py /
banded_sw_xla.py (same src priority diag > E > F, same tie bits);
only the STORAGE layout differs: nibble of cell (i, j) lives at
word (a-1)//4, byte (a-1)%4, lane l of its antidiag step a = i + j.
traceback_adiag() walks that layout directly and emits the compact
wire format of ops/banded_sw.py (op bitmap + D events + tail), with
events ordered row-DESCENDING from the top of the slot array
(`topdown` decoding, native/decode_compact_batch).

Reference parity: SURVEY.md section 3.4 (ksw.c = the hot kernel);
the antidiagonal sweep is the classic wavefront vectorization the
survey prescribes for TPU ("anti-diagonal wavefront vectorization").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lamsa_tpu.ops.banded_sw_pallas import NEG_INF

_STEPS_PER_WORD = 4
_WORDS_PER_STORE = 8
_STEPS_PER_GROUP = 32


def a_pad(M: int, W: int) -> int:
    """Static step count for an (M, W) bucket: a = i + j <= m + n with
    m <= M, n <= m + lo + W - 1 <= M + W - 1; rounded to the 128-step
    grid block."""
    return -(-(2 * M + W) // 128) * 128


def _win(blk, SPAN, k):
    """Static window extract: out[d] = blk[d + k] for a python int
    k >= 0 (one immediate-shift lane shuffle). Caller guarantees
    d + k < SPAN for the consumed [:V] lanes — no wrap."""
    return blk if k == 0 else pltpu.roll(blk, SPAN - k, axis=1)


def _kernel(qre_ref, twf_ref, m_ref, n_ref, hl_ref,
            dirs_ref, cape_ref, capo_ref,
            h1_scr, h2_scr, e_scr, f_scr, ce_scr, co_scr, *,
            match, mismatch, gapo, gape, G, V, AU, RB, n_blocks):
    rb = pl.program_id(1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (G, V), 1)
    m = m_ref[:, 0][:, None]
    n = n_ref[:, 0][:, None]
    hl = hl_ref[:, 0][:, None]
    NEG = jnp.int32(NEG_INF)
    # E-chain fixed point through all-invalid prefixes, and the value
    # that makes the computed chain at d == 0 equal the spec's
    # p_excl[0] - gapo (see module docstring)
    E_DEAD = jnp.int32(NEG_INF - gapo - gape)
    E_FILL = jnp.int32(NEG_INF - gapo + gape)

    @pl.when(rb == 0)
    def _init():
        # state of step a = 0: only cell (0, 0), at lane ib(0) = -hl
        h1_scr[:] = jnp.where(lanes == -hl, 0, NEG)
        h2_scr[:] = jnp.full((G, V), NEG, jnp.int32)
        e_scr[:] = jnp.full((G, V), E_DEAD, jnp.int32)
        f_scr[:] = jnp.full((G, V), NEG, jnp.int32)
        ce_scr[:] = jnp.full((G, V), NEG, jnp.int32)
        co_scr[:] = jnp.full((G, V), NEG, jnp.int32)

    ablk0 = rb * RB                       # steps ablk0+1 .. ablk0+RB
    # per-block q/t slices at 128-aligned offsets (Mosaic lane-dim
    # dynamic-slice constraint); per group ONE dynamic rotate each,
    # then static rolls per step.  qre[y] = q[AU - y - hl] (reversed,
    # lo-absorbed); twf[y] = t[y + hl].  Window bases:
    #   q: AU - u + 1 (decreasing), t: u + par - 1 (increasing)
    u_lo = (ablk0 + 1) >> 1               # u at first step of block
    SPAN = _span(V)
    qb_blk = AU - (u_lo + 64) + 1         # lowest q base in block
    qoff = pl.multiple_of(
        jnp.maximum(((qb_blk - 1) >> 7) << 7, 0), 128)
    q_blk = qre_ref[:, pl.ds(qoff, SPAN)]
    toff = pl.multiple_of((u_lo >> 7) << 7, 128)
    t_blk = twf_ref[:, pl.ds(toff, SPAN)]

    max_a = jnp.max(m_ref[:] + n_ref[:])

    def group_body(g, _):
        ag0 = ablk0 + g * _STEPS_PER_GROUP + 1   # first step (ODD: see
        # parity note — rb*RB and g*32 are even, so ag0 is always odd
        # and par(k) = (1 + k) & 1 is STATIC per unrolled step)

        @pl.when(ag0 <= max_a)
        def _run():
            u0 = ag0 >> 1
            # one dynamic rotate each per group; static per-step rolls.
            # q bases DECREASE with k (by du <= 16), so rotate the
            # lowest base of the group to lane 0 and use offsets
            # 16 - du >= 0; t bases increase, offsets du + par - 1 >= 0.
            rot_q = (AU - u0 + 1 - 16) - qoff    # q base at k=31
            rot_t = (u0 + 0) - toff              # t base at k=0
            q_grp = pltpu.roll(q_blk, SPAN - rot_q, axis=1)
            t_grp = pltpu.roll(t_blk, SPAN - rot_t, axis=1)

            h1 = h1_scr[:]
            h2 = h2_scr[:]
            e = e_scr[:]
            f = f_scr[:]
            ce = ce_scr[:]
            co = co_scr[:]
            words = []
            word = jnp.zeros((G, V), jnp.int32)
            for k in range(_STEPS_PER_GROUP):
                a = ag0 + k
                par = (1 + k) & 1                # a & 1, static
                du = (1 + k) >> 1                # u - u0, static
                ub = u0 + du                     # traced scalar u
                # ---- source shifts (2 rotates/step total)
                if par == 0:                     # even a: E shifts right
                    h_e = jnp.where(lanes < 1, NEG,
                                    pltpu.roll(h1, 1, axis=1))
                    e_s = jnp.where(lanes < 1, E_FILL,
                                    pltpu.roll(e, 1, axis=1))
                    h_f, f_s = h1, f
                else:                            # odd a: F shifts left
                    h_f = jnp.where(lanes >= V - 1, NEG,
                                    pltpu.roll(h1, V - 1, axis=1))
                    f_s = jnp.where(lanes >= V - 1, NEG,
                                    pltpu.roll(f, V - 1, axis=1))
                    h_e, e_s = h1, e
                # ---- E chain (exact spec-equal form)
                hg = h_e - gapo
                ebit = e_s >= hg
                if par == 0:
                    ebit = ebit & (lanes >= 1)   # spec: ebit[d=0] = 0
                e_new = jnp.maximum(e_s, hg) - gape
                # ---- F chain (mirrors row spec exactly)
                hgf = h_f - gapo
                fbit = f_s >= hgf
                f_new = jnp.maximum(jnp.maximum(hgf, f_s) - gape, NEG)
                # ---- substitution + diag
                qc = _win(q_grp, SPAN, 16 - du)[:, :V]
                tc = _win(t_grp, SPAN, du + par - 1)[:, :V]
                s = jnp.where(qc == tc, jnp.int32(match),
                              jnp.int32(-mismatch))
                diag = jnp.maximum(h2 + s, NEG)
                # ---- validity: lanes with 1 <= i <= m and 0 <= j <= n
                # i = (ub - hl) - l, j = (ub + par + hl) + l
                ibc = ub - hl                    # (G, 1)
                jbc = ub + par + hl
                lo_l = jnp.maximum(ibc - m, -jbc)
                hi_l = jnp.minimum(ibc - 1, n - jbc)
                valid = (lanes >= lo_l) & (lanes <= hi_l)
                # ---- H select, priority diag > E > F (spec order)
                e_m = jnp.where(valid & (lanes >= 1 - jbc),
                                jnp.maximum(e_new, NEG), NEG)
                f_m = jnp.where(valid, f_new, NEG)
                h = jnp.where(valid, diag, NEG)
                src = jnp.zeros((G, V), jnp.int32)
                src = jnp.where(e_m > h, 1, src)
                h = jnp.maximum(h, e_m)
                src = jnp.where(f_m > h, 2, src)
                h = jnp.maximum(h, f_m)
                # ---- direction nibble (bit-identical to the row spec)
                nib = (src | (ebit.astype(jnp.int32) << 2)
                       | (fbit.astype(jnp.int32) << 3))
                nib = jnp.where(valid, nib, 0)
                word = word | (nib << (8 * (k % 4)))   # (a-1)%4 == k%4
                if k % 4 == 3:
                    words.append(word)
                    word = jnp.zeros((G, V), jnp.int32)
                # ---- row-0 injection (cells (0, a) enter the wavefront
                # one lane per step; E at that lane is never consumed)
                r0 = lanes == ibc
                h0v = jnp.where(a <= n, -gapo - a * gape, NEG)
                h = jnp.where(r0, h0v, h)
                f_m = jnp.where(r0, NEG, f_m)
                # ---- h_last capture at i == m (lands at lane
                # (d - par)/2 of the parity's capture array)
                capm = lanes == ibc - m
                if par == 0:
                    ce = jnp.where(capm, h, ce)
                else:
                    co = jnp.where(capm, h, co)
                # ---- advance state
                h2 = h1
                h1 = h
                e = e_new
                f = f_m
            off = pl.multiple_of(g * _WORDS_PER_STORE, _WORDS_PER_STORE)
            dirs_ref[:, pl.ds(off, _WORDS_PER_STORE), :] = \
                jnp.stack(words, axis=1)
            h1_scr[:] = h1
            h2_scr[:] = h2
            e_scr[:] = e
            f_scr[:] = f
            ce_scr[:] = ce
            co_scr[:] = co
        return 0

    jax.lax.fori_loop(0, RB // _STEPS_PER_GROUP, group_body, 0)

    @pl.when(rb == n_blocks - 1)
    def _fin():
        cape_ref[:] = ce_scr[:]
        capo_ref[:] = co_scr[:]


def _pick_tile(B: int, M: int, W: int) -> int:
    for G in (128, 64, 32, 16, 8):
        if B % G:
            continue
        V = W // 2
        AU = a_pad(M, W) // 2
        est = (G * (2 * AU + 2 * V + 512) * 4    # qre + twf (int32)
               + 2 * G * 8 * V * 4 * 2           # dirs block + word stack
               + 6 * G * V * 4                   # state + capture scratch
               + 2 * G * (V + 256) * 4)          # q/t rotated blocks
        if est <= 11 * 2**20:
            return G
    return 8


def _span(V: int) -> int:
    """In-kernel q/t slice width: V + 256 rounded up to a 128
    multiple — Mosaic rejects dynamic rotates on non-128-multiple lane
    widths (the V=64 crash)."""
    return -(-(V + 256) // 128) * 128


def adiag_windows(M: int, W: int):
    """(AU, QL) static geometry for an (M, W) bucket's pre-gathered
    window arrays: qre[y] = q[AU - y - hl] (reversed, lo-absorbed,
    sentinel 4), twf[y] = t[y + hl] (sentinel 5, ref N 4 -> 6)."""
    A = a_pad(M, W)
    return A // 2, A // 2 + _span(W // 2)


@functools.partial(jax.jit, static_argnames=(
    "match", "mismatch", "gapo", "gape", "instance_tile", "interpret"))
def banded_sw_adiag(q, t_win, m_len, n_len, lo, *, match, mismatch,
                    gapo, gape, instance_tile=None, interpret=False):
    """Antidiagonal global-gap DP. Same input contract as
    banded_sw_pallas (q [B, M], t_win [B, M+W] with t_win[x] = t[x+lo])
    except lo MUST be even per instance (callers: extend.global_lo).

    Returns dict:
      dirs32a: int32[B, A/4, V] packed direction words in ANTIDIAG
               layout (cell (i, j): word (i+j-1)//4, byte (i+j-1)%4,
               lane ((j-i-lo) - ((i+j)&1)) // 2);
      h_last:  int32[B, W] — H row at i == m (same contract as the row
               kernels; dead lanes floor at NEG_INF).
    """
    B, M = q.shape
    W = t_win.shape[1] - M
    AU, QL = adiag_windows(M, W)

    hl = jnp.asarray(lo, jnp.int32) >> 1      # lo even: hl = lo / 2
    qre, twf = make_adiag_windows(q, t_win, m_len, hl, M=M, W=W)
    return banded_sw_adiag_pre(qre, twf, m_len, n_len, hl, M=M, W=W,
                               match=match, mismatch=mismatch,
                               gapo=gapo, gape=gape,
                               instance_tile=instance_tile,
                               interpret=interpret)


def _shift_rows(x, v, stages=7, left=False):
    """out[g, y] = x[g, y - v_g] (or x[g, y + v_g] when left=True) for
    per-row v_g in [0, 2**stages) as a log-shift network: `stages`
    (roll, select) dense-VPU pairs. Out-of-range lanes receive wrapped
    garbage — callers mask by position. This replaces a per-row
    gather: generic gathers sustain only ~130 M elem/s on this v5e
    (measured 2026-08-20) vs effectively free dense rolls — the
    original gather prologue cost 13x the DP kernel itself."""
    vb = v[:, None]
    for k in range(stages):
        s = -(1 << k) if left else (1 << k)
        x = jnp.where((vb & (1 << k)) != 0, jnp.roll(x, s, axis=1), x)
    return x


def make_adiag_windows(q, t_win, m_len, hl, *, M, W):
    """Build the adiag pre-gathered window arrays from row-layout
    q [B, M] / t_win [B, M+W] (see adiag_windows): reversed lo-absorbed
    qre[y] = q[AU - y - hl] (sentinel 4) and twf[y] = t[y + hl]
    (sentinel 5, ref N 4 -> 6), via static flips/pads plus the
    _shift_rows network — no gathers."""
    B = q.shape[0]
    AU, QL = adiag_windows(M, W)
    y = jnp.arange(QL, dtype=jnp.int32)[None, :]
    hlb = hl[:, None]
    v = -hl                                   # per-row shift in [0, 128)
    qpad = jnp.concatenate(
        [jnp.asarray(q, jnp.int32)[:, ::-1],
         jnp.full((B, QL - M), 4, jnp.int32)], axis=1)
    qsh = _shift_rows(jnp.roll(qpad, AU - M + 1, axis=1), v)
    qi = AU - y - hlb
    qre = jnp.where((qi >= 0) & (qi < m_len[:, None]), qsh, 4)
    tpad = jnp.concatenate(
        [jnp.asarray(t_win, jnp.int32),
         jnp.full((B, QL - (M + W)), 5, jnp.int32)], axis=1)
    tsh = _shift_rows(tpad, v, left=True)     # twf[y] = t_win[y + v]
    ti = y - hlb
    tv = jnp.where((ti >= 0) & (ti < M + W), tsh, 5)
    twf = jnp.where(tv == 4, 6, tv)
    return qre, twf


def banded_sw_adiag_pre(qre, twf, m_len, n_len, hl, *, M, W, match,
                        mismatch, gapo, gape, instance_tile=None,
                        interpret=False):
    """Kernel entry on PRE-GATHERED window arrays (adiag_windows
    layout). The production descriptor path builds these via the
    row-layout packed-word gather (ops/banded_sw.py::gather_windows)
    followed by make_adiag_windows' dense shift networks — no extra
    gathers beyond the two word gathers per chunk."""
    B = qre.shape[0]
    assert W % 2 == 0
    V = W // 2
    A = a_pad(M, W)
    AU = A // 2
    RB = 128
    G = instance_tile or _pick_tile(B, M, W)
    assert B % G == 0

    kernel = functools.partial(
        _kernel, match=match, mismatch=mismatch, gapo=gapo, gape=gape,
        G=G, V=V, AU=AU, RB=RB, n_blocks=A // RB)
    scalar_spec = pl.BlockSpec((G, 1), lambda ib, rb: (ib, 0),
                               memory_space=pltpu.VMEM)
    QL = qre.shape[1]
    dirs, cape, capo = pl.pallas_call(
        kernel,
        grid=(B // G, A // RB),
        in_specs=[
            pl.BlockSpec((G, QL), lambda ib, rb: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, QL), lambda ib, rb: (ib, 0),
                         memory_space=pltpu.VMEM),
            scalar_spec, scalar_spec, scalar_spec,
        ],
        out_specs=[
            pl.BlockSpec((G, RB // 4, V), lambda ib, rb: (ib, rb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, V), lambda ib, rb: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, V), lambda ib, rb: (ib, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, A // 4, V), jnp.int32),
            jax.ShapeDtypeStruct((B, V), jnp.int32),
            jax.ShapeDtypeStruct((B, V), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((G, V), jnp.int32)] * 6,
        cost_estimate=pl.CostEstimate(
            flops=B * A * V * 12, bytes_accessed=B * A * V,
            transcendentals=0),
        interpret=interpret,
    )(qre, twf, m_len.reshape(B, 1), n_len.reshape(B, 1),
      hl.reshape(B, 1))

    h_last = jnp.stack([cape, capo], axis=2).reshape(B, W)
    return {"dirs32a": dirs, "h_last": h_last}


def unpack_dirs_adiag(dirs32a: np.ndarray, m_len, n_len, lo,
                      M: int, W: int) -> np.ndarray:
    """Test helper: antidiag-layout packed words -> row-major uint8
    dirs [B, M, W] (zeros outside computed cells), comparable with the
    XLA engine's output."""
    B, A4, V = dirs32a.shape
    out = np.zeros((B, M, W), np.uint8)
    for b in range(B):
        m, n, lob = int(m_len[b]), int(n_len[b]), int(lo[b])
        for i in range(1, m + 1):
            for d in range(W):
                j = i + lob + d
                if j < 0 or j > n:
                    continue
                a = i + j
                if a < 1 or a > A4 * 4:
                    continue
                l = (d - (a & 1)) >> 1
                if not (0 <= l < V):
                    continue
                w = int(dirs32a[b, (a - 1) // 4, l])
                out[b, i - 1, d] = (w >> (8 * ((a - 1) % 4))) & 0xF
    return out


# ---------------------------------------------------------------- walker

def _tb_kernel(dirs_ref, si_ref, sd_ref, hl_ref,
               op_ref, ev_ref, tail_ref,
               st_scr, op_scr, ev_scr, wreg_scr, *,
               G, V, NW, EW, RB, n_blocks, wide, e_slots):
    """Compact-traceback walk over antidiag-layout dirs.

    One lockstep sweep per step a (descending): an instance whose
    cursor sits on antidiag a consumes its nibble and moves (M: a-2,
    D/I: a-1); M-movers idle the next sweep. Each DP row contributes
    exactly one M or I plus an optional D run, emitted straight into
    the compact wire fields (ops/banded_sw.py format) — the op bitmap
    (bit = I), D events written row-DESCENDING from slot 0 ("topdown"
    order, reversed host-side in collect_group_pallas), term0 = j at
    row 0, and the event count (0xFFFF = overflow -> host recompute).

    LAYOUT: all per-instance walk state lives LANE-MAJOR — st_scr is
    (8, G) with one field per sublane row ([0]=i, [1]=lane, [2]=mode
    0 H/1 E/2 F, [3]=pending D count, [4]=event count, [5]=overflow,
    [6]=term0, [7]=cursor a, 0 once finished), and the wire
    accumulators are (NW, G)/(EW, G). A (1, G) field op touches ONE
    vreg; the same op on a (G, 1) column pads lanes and touches 16 —
    the first version of this walker spent ~6x the DP kernel's time on
    exactly that. The only G-major crossings per sweep are two
    (G,1)<->(1,G) transposes around the nibble lane-select."""
    rb = pl.program_id(1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (G, V), 1)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, G), 0)
    subnw = jax.lax.broadcasted_iota(jnp.int32, (NW, G), 0)
    subew = jax.lax.broadcasted_iota(jnp.int32, (EW, G), 0)
    CMAX = 8191 if wide else 30
    RSH = 13 if wide else 5

    @pl.when(rb == 0)
    def _init():
        si = jnp.transpose(si_ref[:], (1, 0))          # (1, G)
        sd = jnp.transpose(sd_ref[:], (1, 0))
        hl = jnp.transpose(hl_ref[:], (1, 0))
        sj = si + 2 * hl + sd
        sa = si + sj
        l0 = (sd - (sa & 1)) >> 1
        st_scr[:] = jnp.where(
            sub8 == 0, si,
            jnp.where(sub8 == 1, l0,
                      jnp.where(sub8 == 6, jnp.where(si == 0, sj, 0),
                                jnp.where(sub8 == 7,
                                          jnp.where(si == 0, 0, sa),
                                          0))))
        op_scr[:] = jnp.zeros((NW, G), jnp.int32)
        ev_scr[:] = jnp.zeros((EW, G), jnp.int32)

    ab0 = (n_blocks - 1 - rb) * RB        # steps ab0+1 .. ab0+RB

    def group_body(gg, _):
        g = RB // _STEPS_PER_GROUP - 1 - gg

        @pl.when(jnp.max(st_scr[7:8, :]) >= ab0 + g * 32 + 1)
        def _run():
            off = pl.multiple_of(g * 8, 8)
            wreg_scr[:] = dirs_ref[:, pl.ds(off, 8), :]
            for k in range(_STEPS_PER_GROUP - 1, -1, -1):
                a = ab0 + g * 32 + k + 1
                par = (1 + k) & 1             # a & 1, static
                stf = st_scr[:]
                i = stf[0:1, :]
                l = stf[1:2, :]
                mode = stf[2:3, :]
                pend = stf[3:4, :]
                evc = stf[4:5, :]
                ovf = stf[5:6, :]
                term0 = stf[6:7, :]
                acur = stf[7:8, :]
                active = (acur == a) & (i >= 1)
                # --- nibble at (word k//4, byte k%4, lane l): the two
                # transposes are the only G-major ops in the sweep
                word = wreg_scr[:, k // 4, :]
                lT = jnp.transpose(l, (1, 0))          # (G, 1)
                sel = jnp.sum(jnp.where(lanes == lT, word, 0), axis=1,
                              keepdims=True)
                nib = (jnp.transpose(sel, (1, 0)) >> (8 * (k % 4))) & 0xF
                src = nib & 3
                eext = (nib >> 2) & 1
                fext = (nib >> 3) & 1
                isE = active & ((mode == 1) | ((mode == 0) & (src == 1)))
                isF = active & ((mode == 2) | ((mode == 0) & (src == 2)))
                isM = active & (mode == 0) & (src == 0)
                commit = isM | isF
                # --- emissions for the completing row r = i (RMW
                # through scratch; unrolled value-carried accumulators
                # blow Mosaic's scoped-VMEM stack)
                ebm = commit & (pend > 0)
                widx = (i - 1) >> 5
                op_scr[:] = op_scr[:] | jnp.where(
                    (subnw == widx) & isF, 1 << ((i - 1) & 31), 0)
                cnt = jnp.minimum(pend, CMAX)
                val = ((i - 1) << RSH) | cnt
                if wide:
                    ev_scr[:] = ev_scr[:] | jnp.where(
                        (subew == evc) & ebm, val, 0)
                else:
                    ev_scr[:] = ev_scr[:] | jnp.where(
                        (subew == (evc >> 1)) & ebm,
                        val << (16 * (evc & 1)), 0)
                ovf = ovf | (ebm & ((pend > CMAX) | (evc >= e_slots)))
                evc = evc + ebm
                # --- cursor updates
                pend = jnp.where(isE, pend + 1,
                                 jnp.where(commit, 0, pend))
                i2 = i - commit
                a2 = acur - isM * 2 - (isE | isF)
                if par == 0:
                    l2 = l - isE                  # even a: D moves l-1
                else:
                    l2 = l + isF                  # odd a: I moves l+1
                mode = jnp.where(
                    isE, jnp.where(eext == 1, 1, 0),
                    jnp.where(isF, jnp.where(fext == 1, 2, 0),
                              jnp.where(isM, 0, mode)))
                fin = commit & (i2 == 0)
                term0 = jnp.where(fin, a2, term0)
                acur = jnp.where(fin, 0, jnp.where(active, a2, acur))
                st_scr[:] = jnp.where(
                    sub8 == 0, i2,
                    jnp.where(sub8 == 1, l2,
                              jnp.where(sub8 == 2, mode,
                                        jnp.where(sub8 == 3, pend,
                                                  jnp.where(sub8 == 4, evc,
                                                            jnp.where(sub8 == 5, ovf,
                                                                      jnp.where(sub8 == 6, term0, acur)))))))
        return 0

    jax.lax.fori_loop(0, RB // _STEPS_PER_GROUP, group_body, 0)

    @pl.when(rb == n_blocks - 1)
    def _fin():
        op_ref[:] = jnp.transpose(op_scr[:], (1, 0))
        ev_ref[:] = jnp.transpose(ev_scr[:], (1, 0))
        stf = st_scr[:]
        n_ev = jnp.where(stf[5:6, :] > 0, 0xFFFF, stf[4:5, :])
        tcol = jax.lax.broadcasted_iota(jnp.int32, (8, G), 0)
        tail = jnp.where(tcol == 0, stf[6:7, :],
                         jnp.where(tcol == 1, n_ev, 0))
        tail_ref[:] = jnp.transpose(tail, (1, 0))


@functools.partial(jax.jit, static_argnames=("M", "instance_tile",
                                             "interpret"))
def traceback_adiag(dirs32a, si, sd, hl, *, M, instance_tile=None,
                    interpret=False):
    """Walk antidiag-layout dirs from (si, band-offset sd) to row 0.
    Returns (opbits [B, M/32], events [B, compact_words(M)],
    term0 [B], n_ev [B]) — the compact wire fields, events in
    row-descending ("topdown") slot order."""
    from lamsa_tpu.ops.banded_sw import compact_E, compact_wide, \
        compact_words
    B, A4, V = dirs32a.shape
    A = A4 * 4
    NW = M // 32
    EW = compact_words(M)
    wide = compact_wide(M)
    e_slots = compact_E(M)
    RB = 128
    G = instance_tile or 128
    while B % G:
        G //= 2
    kernel = functools.partial(_tb_kernel, G=G, V=V, NW=NW, EW=EW,
                               RB=RB, n_blocks=A // RB, wide=wide,
                               e_slots=e_slots)
    rev = lambda rb: A // RB - 1 - rb
    scalar_spec = pl.BlockSpec((G, 1), lambda ib, rb: (ib, 0),
                               memory_space=pltpu.VMEM)
    opbits, events, tail = pl.pallas_call(
        kernel,
        grid=(B // G, A // RB),
        in_specs=[
            pl.BlockSpec((G, RB // 4, V), lambda ib, rb: (ib, rev(rb), 0),
                         memory_space=pltpu.VMEM),
            scalar_spec, scalar_spec, scalar_spec,
        ],
        out_specs=[
            pl.BlockSpec((G, NW), lambda ib, rb: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, EW), lambda ib, rb: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 8), lambda ib, rb: (ib, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, NW), jnp.int32),
            jax.ShapeDtypeStruct((B, EW), jnp.int32),
            jax.ShapeDtypeStruct((B, 8), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, G), jnp.int32),       # lane-major walk state
            pltpu.VMEM((NW, G), jnp.int32),      # opbit acc (transposed)
            pltpu.VMEM((EW, G), jnp.int32),      # event acc (transposed)
            pltpu.VMEM((G, 8, V), jnp.int32),
        ],
        interpret=interpret,
    )(dirs32a, si.reshape(B, 1), sd.reshape(B, 1), hl.reshape(B, 1))
    return opbits, events, tail[:, 0], tail[:, 1]
