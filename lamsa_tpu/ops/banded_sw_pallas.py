"""Banded affine-gap Smith-Waterman — Pallas TPU kernel.

The hot kernel of the whole framework (SURVEY.md section 3.4: the
reference's ksw SSE2 inner loop, >80% of its CPU time; BASELINE.json
names "anti-diagonal wavefront vectorization" as the TPU design). The
math is identical to ops/banded_sw_xla.py (the jit-able spec, tested
bit-identical to ops/oracle.py): rolling-diagonal band layout, one DP
row per step, affine E state resolved with an in-row exclusive
prefix-max (log-doubling shifts over the 128/256 VPU lanes).

Execution shape: grid = (batch tiles, row blocks). Each program holds a
(G, W) tile of DP state — G instances on sublanes, the whole band on
lanes — in VMEM scratch that persists across the row-block grid
dimension (TPU grid execution is sequential), so HBM traffic is just
the inputs once plus the direction bits out.

Mosaic TPU constraints shape two details:
  * lane-dim dynamic offsets must be 128-aligned -> per row-block we
    slice q/t at aligned offsets, dynamic-rotate (``pltpu.roll`` with a
    traced shift) ONCE per 32-row group to bring the group's first
    element to lane 0, then extract each unrolled row's q element / t
    window with static rolls (immediate-shift lane shuffles);
  * sublane-dim dynamic stores must be 8-aligned -> direction bytes are
    packed 4 rows per int32 word (word w holds rows 4w..4w+3 in its
    bytes, little-endian) and flushed 8 words (32 rows) at a time.
    Packed form is also what the native traceback consumes — 1/4 the
    HBM->host traffic of byte dirs.

Score lanes are int32; the int16 variant (score_dtype="int16") is
implemented, bit-exact in interpret mode, and its rolls are now routed
through a pltpu.bitcast-to-int32 sublane-pair trick (_roll) that
sidesteps Mosaic's missing sub-32-bit tpu.rotate. It still cannot
compile here: probed on this toolchain (2026-08-20), Mosaic fails to
legalize EVERY int16 vector ALU op — arith.maxsi ("failed to
legalize"), comparisons ("Target does not support this comparison"),
arith.shli, arith.muli — so int16 score lanes have no hardware path at
all on this stack, not just no rotate. BASELINE.json's "int8/int16
score lanes" target resumes when the compiler grows 16-bit VPU ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -(1 << 29)

_ROWS_PER_WORD = 4
_WORDS_PER_STORE = 8
_ROWS_PER_GROUP = _ROWS_PER_WORD * _WORDS_PER_STORE   # 32


def _roll(x, s):
    """Lane-axis rotate that also works for int16 data. Mosaic has no
    sub-32-bit tpu.rotate/tpu.dynamic_rotate, so for int16 we
    reinterpret sublane PAIRS as int32 words (pltpu.bitcast packs rows
    2g and 2g+1 of the sublane dim into one word), rotate at 32-bit
    width, and reinterpret back. Lane semantics are unchanged — both
    packed rows move together — and the rotate touches half the vregs,
    which is the point of the int16 engine."""
    if x.dtype == jnp.int16:
        x32 = pltpu.bitcast(x, jnp.int32)
        return pltpu.bitcast(pltpu.roll(x32, s, axis=1), jnp.int16)
    return pltpu.roll(x, s, axis=1)


def _shift_right(x, s, fill, lanes):
    """lane d <- x[d - s] (fill for d < s)."""
    return jnp.where(lanes < s, fill, _roll(x, s))


def _shift_left(x, s, fill, lanes, W):
    """lane d <- x[d + s] (fill for d >= W - s). pltpu.roll requires a
    non-negative shift, so left-shift-by-s is roll-by-(W - s)."""
    return jnp.where(lanes >= W - s, fill, _roll(x, W - s))


def _kernel(q_ref, t_ref, mlen_ref, nlen_ref, lo_ref, zdrop_ref,
            dirs_ref, hlast_ref, best_ref,
            h_scr, f_scr, hlast_scr, bls_scr, blr_scr, alive_scr, *,
            match, mismatch, gapo, gape, G, W, RB, n_row_blocks, DT, NEG):
    rb = pl.program_id(1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (G, W), 1)
    lanes_s = lanes.astype(DT)          # score-space lane index (<= W-1)
    lo = lo_ref[:, 0][:, None]
    m = mlen_ref[:, 0][:, None]
    n = nlen_ref[:, 0][:, None]
    match_s = DT(match)
    mismatch_s = DT(-mismatch)
    lanes_gape = lanes_s * DT(gape)     # row-invariant (hoisted)
    jbase = lo + lanes                  # row-invariant column base

    @pl.when(rb == 0)
    def _init():
        j0 = lo + lanes
        h0 = jnp.where(j0 == 0, DT(0),
                       jnp.where((j0 >= 1) & (j0 <= n),
                                 (-(gapo + j0 * gape)).astype(DT), NEG))
        h_scr[:] = h0
        f_scr[:] = jnp.full((G, W), NEG, DT)
        hlast_scr[:] = jnp.where(m == 0, h0, NEG)
        # per-lane best tracking (score, earliest row achieving it);
        # the cross-lane reduction happens ONCE in _fin instead of
        # every row — the old per-row max+argmin pair was ~1/3 of the
        # row's op budget
        bls_scr[:] = h0
        blr_scr[:] = jnp.zeros((G, W), jnp.int32)
        alive_scr[:] = jnp.ones((G, W), jnp.int32)

    # Lane-dim dynamic slices must be 128-aligned: slice at the block
    # start, rotate per row. q/t converted to the score dtype once per
    # block so per-row rotates run at score-lane width.
    blk0 = pl.multiple_of(rb * RB, 128)
    q_blk = q_ref[:, pl.ds(blk0, RB)].astype(DT)            # (G, RB)
    TK = RB + W
    t_blk = t_ref[:, pl.ds(blk0, TK)].astype(DT)            # (G, RB+W)

    def row_compute(r, qc, tc):
        """One DP row; returns the packed direction nibble (G, W) i32.
        qc (G, 1) = q[i-1]; tc (G, W) = the row's t window — extracted
        by the caller with STATIC rotates from a per-group rotated
        block (one dynamic tpu.dynamic_rotate per 32 rows instead of
        two per row; dynamic rotates were the kernel's costliest op)."""
        i = rb * RB + r + 1
        h_prev = h_scr[:]
        f_prev = f_scr[:]

        h_up = _shift_left(h_prev, 1, NEG, lanes, W)
        f_up = _shift_left(f_prev, 1, NEG, lanes, W)
        f_ext_bit = f_up >= h_up - gapo
        f_cur = jnp.maximum(jnp.maximum(h_up - gapo, f_up) - gape, NEG)

        s = jnp.where((qc == tc) & (qc < 4) & (tc < 4), match_s, mismatch_s)
        diag = jnp.maximum(h_prev + s, NEG)

        j = i + jbase
        valid = (j >= 0) & (j <= n)
        h_nogap = jnp.where(valid, jnp.maximum(diag, f_cur), NEG)

        v = h_nogap + lanes_gape
        p = v
        sft = 1
        while sft < W:
            p = jnp.maximum(p, _shift_right(p, sft, NEG, lanes))
            sft *= 2
        p_excl = _shift_right(p, 1, NEG, lanes)
        e_cur = jnp.where(valid & (j >= 1),
                          jnp.maximum(p_excl - lanes_gape - gapo, NEG),
                          NEG)
        e_ext_bit = _shift_right((v <= p_excl).astype(DT), 1,
                                 DT(0), lanes)

        diag_m = jnp.where(valid, diag, NEG)
        f_m = jnp.where(valid, f_cur, NEG)
        h = diag_m
        src = jnp.zeros((G, W), DT)
        src = jnp.where(e_cur > h, DT(1), src)
        h = jnp.maximum(h, e_cur)
        src = jnp.where(f_m > h, DT(2), src)
        h = jnp.maximum(h, f_m)

        in_rows = i <= m                                    # (G, 1)
        live = in_rows & valid
        h = jnp.where(live, h, NEG)
        f_m = jnp.where(live, f_m, NEG)

        d_byte = (src.astype(jnp.int32)
                  | (e_ext_bit.astype(jnp.int32) << 2)
                  | (f_ext_bit.astype(jnp.int32) << 3))
        d_byte = jnp.where(live, d_byte, 0)

        # zdrop-frozen instances stop updating h_last and the best cell
        # (the DP itself free-runs so dirs match the XLA engine, which
        # cannot skip rows; ops/oracle.py ZDROP_GROUP contract)
        aliveb = alive_scr[:] > 0
        hlast_scr[:] = jnp.where((i == m) & aliveb, h, hlast_scr[:])

        imp = (h > bls_scr[:]) & aliveb    # strict > keeps earliest row
        bls_scr[:] = jnp.where(imp, h, bls_scr[:])
        blr_scr[:] = jnp.where(imp, i, blr_scr[:])

        h_scr[:] = h
        f_scr[:] = f_m
        return d_byte

    # Skip 32-row groups entirely above every instance's query length in
    # this tile (instances are sorted by length by the batcher, so tiles
    # of short gaps skip most of M), and once every instance in the tile
    # has z-dropped. Dirs for skipped rows stay garbage in HBM — the
    # traceback never reads rows above its start cell (always <= the
    # zstop row for a dropped extension).
    max_m = jnp.max(mlen_ref[:])

    def group_body(g, _):
        @pl.when((rb * RB + g * _ROWS_PER_GROUP < max_m)
                 & (jnp.max(alive_scr[:]) > 0))
        def _run():
            # One dynamic rotate per (G, RB) q / (G, RB+W) t block per
            # 32-row group brings lane g*32 to lane 0; the 32 rows are
            # then unrolled statically and each row's q element / t
            # window comes from a STATIC roll (lane shuffle with an
            # immediate — far cheaper than tpu.dynamic_rotate, which
            # lowers to a log-step shuffle cascade per row).
            g0 = g * _ROWS_PER_GROUP
            q_grp = _roll(q_blk, RB - g0)
            t_grp = _roll(t_blk, TK - g0)
            words = []
            for w in range(_WORDS_PER_STORE):
                word = jnp.zeros((G, W), jnp.int32)
                for p in range(_ROWS_PER_WORD):
                    k = w * _ROWS_PER_WORD + p          # row within group
                    qc = q_grp[:, 0:1] if k == 0 else \
                        _roll(q_grp, RB - k)[:, 0:1]
                    tc = (t_grp if k == 0 else
                          _roll(t_grp, TK - k))[:, :W]
                    d_byte = row_compute(g0 + k, qc, tc)
                    word = word | (d_byte << (8 * p))
                words.append(word)
            off = pl.multiple_of(g * _WORDS_PER_STORE, _WORDS_PER_STORE)
            dirs_ref[:, pl.ds(off, _WORDS_PER_STORE), :] = \
                jnp.stack(words, axis=1)
            # end-of-group zdrop check (ops/oracle.py ZDROP_GROUP
            # contract): freeze instances whose current row max fell
            # more than zdrop below their running best
            # int16 reductions are unsupported by Mosaic: widen first
            # (a no-op convert in the int32 engine, 1/32 rows in int16)
            zs = zdrop_ref[:, 0][:, None]
            cur = jnp.max(h_scr[:].astype(jnp.int32), axis=1,
                          keepdims=True)
            bb = jnp.max(bls_scr[:].astype(jnp.int32), axis=1,
                         keepdims=True)
            kill = (zs > 0) & (cur < bb - zs)
            alive_scr[:] = jnp.where(kill, 0, alive_scr[:])
        return 0

    jax.lax.fori_loop(0, RB // _ROWS_PER_GROUP, group_body, 0)

    @pl.when(rb == n_row_blocks - 1)
    def _fin():
        hlast_ref[:] = hlast_scr[:].astype(jnp.int32)
        # fold per-lane (score, earliest row) into the global best cell
        # with the oracle tie-break: max score, then smallest row, then
        # smallest lane
        bls = bls_scr[:].astype(jnp.int32)
        blr = blr_scr[:]
        smax = jnp.max(bls, axis=1, keepdims=True)
        at = bls == smax
        rmin = jnp.min(jnp.where(at, blr, jnp.int32(1 << 30)), axis=1,
                       keepdims=True)
        dmin = jnp.min(jnp.where(at & (blr == rmin), lanes, W), axis=1,
                       keepdims=True)
        col = jax.lax.broadcasted_iota(jnp.int32, (G, 8), 1)
        best_ref[:] = jnp.where(col == 0, smax,
                                jnp.where(col == 1, rmin,
                                          jnp.where(col == 2, dmin, 0)))


NEG_INF16 = -30000      # int16 floor; live-path scores stay >> above it

# Per-program VMEM budget (bytes) for the tile chooser. Empirical on
# TPU v5e: G=128 compiles for every production bucket except
# (M=2048, W=256) (estimate 11.5 MB fails, 10.75 MB passes).
_VMEM_BUDGET = 11 * 2**20


def _pick_tile(B: int, M: int, W: int, itemsize: int = 4) -> int:
    """Largest instance tile that divides B, fits VMEM, and is <= 128.

    Measured on TPU v5e (2026-08-18, B*M*W cells/s on full-length
    instances): G=128 is 4-7x faster than G=8 on every production
    bucket — at G=8 each VPU op touches one (8,128) vreg and the row
    loop is latency-bound; G=128 gives 16 vregs per op to pipeline.
    G=256 regresses (VMEM pressure / spills) where it compiles at all.
    """
    floor = 16 if itemsize == 2 else 8      # int16 sublane tile is 16
    for G in (128, 64, 32, 16, 8):
        if B % G or G < floor:
            continue
        if M > 2048 and G > 32:
            # measured: Mosaic's actual scoped-vmem stack at (M=5120,
            # W=256, G=64) is 16.23 MB vs the 16 MB limit (2026-08-21)
            # — the model below underestimates ~2x at huge M; G=32
            # halves it with margin
            continue
        est = (G * itemsize * (M + (M + W))     # q + t blocks
               + 2 * G * (128 // 4) * W * 4     # dirs out block (dbl-buf)
               + G * 8 * W * 4                  # per-group word stack
               + G * W * (4 * itemsize + 8))    # h/f/hlast/bls + blr/alive
        if est <= _VMEM_BUDGET:
            return G
    return floor


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gapo",
                                             "gape", "with_dirs",
                                             "instance_tile", "interpret",
                                             "score_dtype"))
def banded_sw_pallas(q, t_win, m_len, n_len, lo, zdrop=None, *, match,
                     mismatch, gapo, gape, with_dirs=True,
                     instance_tile=None, interpret=False,
                     score_dtype="int32"):
    # NOTE: score_dtype="int16" is implemented and bit-exact in
    # interpret mode, but this environment's Mosaic rejects it at
    # compile time ("Rotate with non-32-bit data" — tpu.dynamic_rotate
    # has no sub-32-bit lowering yet), and lane rotations are this
    # kernel's dominant op. Re-enable as default when Mosaic grows
    # 16-bit rotates; expected ~2x cells/s.
    """Pallas TPU implementation of ops.banded_sw_xla.banded_sw_batch
    (same h_last/best contract — including per-instance zdrop
    extension termination at 32-row-group granularity, ops/oracle.py
    ZDROP_GROUP — and the same direction-byte semantics, but direction
    bytes come back packed 4-rows-per-int32 under key "dirs32" — use
    unpack_dirs, or index words directly as the native traceback does).
    Batch B must be a multiple of instance_tile."""
    from lamsa_tpu.ops.oracle import ZDROP_GROUP
    assert ZDROP_GROUP == _ROWS_PER_GROUP  # zdrop checks ride store groups
    B, M = q.shape
    W = t_win.shape[1] - M
    if zdrop is None:
        zdrop = jnp.zeros((B,), jnp.int32)
    if score_dtype == "int16":
        DT, NEG = np.int16, np.int16(NEG_INF16)
        G = instance_tile or _pick_tile(B, M, W, itemsize=2)
    else:
        DT, NEG = np.int32, np.int32(NEG_INF)
        G = instance_tile or _pick_tile(B, M, W)
    assert B % G == 0, f"batch {B} not a multiple of instance tile {G}"
    RB = 128          # lane alignment: dynamic rotate needs 128 multiples
    assert M % RB == 0, f"M={M} must be a multiple of {RB}"
    n_row_blocks = M // RB
    grid = (B // G, n_row_blocks)

    kernel = functools.partial(
        _kernel, match=match, mismatch=mismatch, gapo=gapo, gape=gape,
        G=G, W=W, RB=RB, n_row_blocks=n_row_blocks, DT=DT, NEG=NEG)

    scalar_spec = pl.BlockSpec((G, 1), lambda ib, rb: (ib, 0),
                               memory_space=pltpu.VMEM)
    dirs32, h_last, best = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, M), lambda ib, rb: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, M + W), lambda ib, rb: (ib, 0),
                         memory_space=pltpu.VMEM),
            scalar_spec, scalar_spec, scalar_spec, scalar_spec,
        ],
        out_specs=[
            pl.BlockSpec((G, RB // _ROWS_PER_WORD, W),
                         lambda ib, rb: (ib, rb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, W), lambda ib, rb: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 8), lambda ib, rb: (ib, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M // _ROWS_PER_WORD, W), jnp.int32),
            jax.ShapeDtypeStruct((B, W), jnp.int32),
            jax.ShapeDtypeStruct((B, 8), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, W), DT),
            pltpu.VMEM((G, W), DT),
            pltpu.VMEM((G, W), DT),
            pltpu.VMEM((G, W), DT),              # per-lane best score
            pltpu.VMEM((G, W), jnp.int32),       # per-lane best row
            pltpu.VMEM((G, W), jnp.int32),       # alive (zdrop) flag
        ],
        cost_estimate=pl.CostEstimate(
            flops=B * M * W * 20, bytes_accessed=B * M * W,
            transcendentals=0),
        interpret=interpret,
    )(q, t_win, m_len.reshape(B, 1), n_len.reshape(B, 1), lo.reshape(B, 1),
      zdrop.reshape(B, 1))

    result = {"h_last": h_last, "best": best[:, :3]}
    if with_dirs:
        result["dirs32"] = dirs32
    return result


def unpack_dirs(dirs32: np.ndarray) -> np.ndarray:
    """int32[B, M/4, W] packed words -> uint8[B, M, W] direction bytes.
    Word layout: byte p (little-endian) holds row 4*w + p."""
    B, M4, W = dirs32.shape
    d8 = np.ascontiguousarray(dirs32).view("<u4").astype("<u4")
    d8 = d8.view(np.uint8).reshape(B, M4, W, 4)
    return np.ascontiguousarray(
        d8.transpose(0, 1, 3, 2).reshape(B, M4 * 4, W))
