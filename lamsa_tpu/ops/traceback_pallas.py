"""On-device CIGAR traceback — Pallas TPU kernel.

Why on device: the DP kernel's direction data is ~1 byte/cell; shipping
it to the host costs more than the DP itself on PCIe and is catastrophic
through this environment's relay (measured 1-30 MB/s, see
ops/banded_sw_pallas.py history). Instead the walk runs on the TPU over
the packed dirs32 words in HBM, and only a per-row step word
(4 bytes/DP-row, ~W/4 x smaller than dirs) returns to the host.

Key observation making the walk vectorizable: in the banded layout every
traceback row visit consists of one optional run of D's (E-state chain
moving left within the row) followed by exactly one up-step (M: same
lane / I: lane+1), so ALL instances advance exactly one DP row per
sweep step and can be walked in lockstep as (G, W) one-hot lane vectors.
The D-run length is a suffix-AND run-length over the row's direction
bits (log2 W shift steps), seeded at the current lane.

Grid: (batch tiles, row blocks REVERSED — index maps flip the row-block
axis so VMEM state walks rows M..1). Outputs per instance:
  steps[b, r-1] for DP row r: (d_count) | (op << 16), op 0=M, 1=I,
  2=inactive (row above the start cell or below row 1);
  term[b, 0] = terminal j at row 0 (leading D count of the CIGAR);
  term[b, 1] = diagnostic final lane.
Host decoding: ops/traceback.py::decode_steps (NumPy spec) or the
native C++ decoder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OP_STEP_M = 0
OP_STEP_I = 1
OP_INACTIVE = 2


def _suffix_and(x, lanes, W):
    """s[y] = AND of x[z] for z >= y (int32 0/1)."""
    s = x
    sft = 1
    while sft < W:
        s = jnp.minimum(s, jnp.where(lanes >= W - sft, 1,
                                     pltpu.roll(s, W - sft, axis=1)))
        sft *= 2
    return s


def _kernel(dirs_ref, mlen_ref, lo_ref, si_ref, sd_ref,
            steps_ref, term_ref,
            flag_scr, acc_scr, wreg_scr, *,
            G, W, M, RB, n_row_blocks):
    rb = pl.program_id(1)                     # 0 = rows [M-RB+1 .. M]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (G, W), 1)
    lo = lo_ref[:, 0][:, None]
    start_i = si_ref[:, 0][:, None]
    start_d = sd_ref[:, 0][:, None]

    @pl.when(rb == 0)
    def _init():
        # flags: [0] alive, [1] in-F-state, [2] current lane d;
        # term pre-set for start_i == 0
        flag_scr[:] = jnp.zeros((G, 8), jnp.int32)
        term0 = jnp.where(start_i == 0, lo + start_d, 0)
        tcol = jax.lax.broadcasted_iota(jnp.int32, (G, 8), 1)
        term_ref[:] = jnp.where(tcol == 0, term0, 0)

    blk_hi = M - rb * RB                      # highest DP row in block
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (G, 8, W), 1)

    def row_body(r_loc, _):
        r = blk_hi - r_loc                    # DP row, descending
        # ---- load the 8-word (32-row) subgroup when entering it
        # (rows descend; the first row of a subgroup has wr_blk % 8 == 7
        # and r % 4 == 0 since blocks are 4-row aligned)
        wr_blk = (r - 1) // 4 - (blk_hi - RB) // 4   # word-row in block
        sg = wr_blk // 8

        @pl.when((wr_blk % 8 == 7) & (r % 4 == 0))
        def _load():
            off = pl.multiple_of(sg * 8, 8)
            wreg_scr[:] = dirs_ref[:, pl.ds(off, 8), :]

        # ---- extract this row's direction bits (G, W)
        word = jnp.sum(jnp.where(sub8 == wr_blk % 8, wreg_scr[:], 0),
                       axis=1)
        byte = (word >> (8 * ((r - 1) % 4))) & 0xF
        src = byte & 3
        e_ext = (byte >> 2) & 1
        f_ext = (byte >> 3) & 1

        # ---- activate instances whose start row is r. The current
        # lane is tracked as a per-instance scalar (flags col 2): lane
        # masks are single broadcast compares instead of one-hot
        # suffix scans.
        flags = flag_scr[:]
        alive = flags[:, 0:1]
        stateF = flags[:, 1:2]
        starting = (start_i == r) & (alive == 0)
        d_scal = jnp.where(starting, start_d, flags[:, 2:3])
        alive = jnp.where(starting, 1, alive)
        stateF = jnp.where(starting, 0, stateF)

        # ---- H path: D-run via suffix-AND run from the seed lane
        is_e = (src == 1).astype(jnp.int32)
        # chain bit c[y] = e_ext[y+1] | is_e[y]
        e_ext_up = jnp.where(lanes >= W - 1, 0, pltpu.roll(e_ext, W - 1,
                                                           axis=1))
        c = jnp.maximum(e_ext_up, is_e)
        # c' = c below d, 1 at/above d
        lt_d = (lanes < d_scal).astype(jnp.int32)
        c_p = jnp.where(lt_d == 1, c, 1)
        sa = _suffix_and(c_p, lanes, W)       # AND of c'[z] for z >= y
        start_bit = jnp.sum(
            jnp.where(lanes == d_scal, is_e, 0), axis=1, keepdims=True)
        emit = jnp.where((lt_d == 1) & (start_bit == 1), sa, 0)
        count_h = jnp.sum(emit, axis=1, keepdims=True) + start_bit
        # NOTE: emit counts lanes y < d; the seed lane d itself also
        # emits one D when start_bit is set.
        x_scal = d_scal - count_h             # exit lane
        oh_x = (lanes == x_scal).astype(jnp.int32)
        src_x = jnp.sum(oh_x * src, axis=1, keepdims=True)
        f_ext_x = jnp.sum(oh_x * f_ext, axis=1, keepdims=True)
        # H exit: src_x == 0 -> M (lane stays); src_x == 2 -> I (lane+1)
        h_is_m = (src_x == 0).astype(jnp.int32)
        h_op = jnp.where(h_is_m == 1, OP_STEP_M, OP_STEP_I)
        h_newlane = jnp.where(h_is_m == 1, x_scal, x_scal + 1)
        h_newF = jnp.where(h_is_m == 1, 0, f_ext_x)

        # ---- F path: immediate I step, no D-run
        f_ext_d = jnp.sum(
            jnp.where(lanes == d_scal, f_ext, 0), axis=1, keepdims=True)
        f_op = jnp.full((G, 1), OP_STEP_I, jnp.int32)
        f_newlane = d_scal + 1
        f_newF = f_ext_d

        inF = stateF == 1
        count = jnp.where(inF, 0, count_h)
        op = jnp.where(inF, f_op, h_op)
        newlane = jnp.where(inF, f_newlane, h_newlane)
        newF = jnp.where(inF, f_newF, h_newF)

        live = alive == 1
        word_out = jnp.where(live, count | (op << 16),
                             OP_INACTIVE << 16)

        # ---- accumulate output row (steps index r-1 within block)
        acc_lanes = jax.lax.broadcasted_iota(jnp.int32, (G, RB), 1)
        idx = (r - 1) % RB
        acc_scr[:] = jnp.where(acc_lanes == idx, word_out, acc_scr[:])

        # ---- commit state
        d_new = jnp.where(live, newlane, d_scal)
        col = jax.lax.broadcasted_iota(jnp.int32, (G, 8), 1)
        flag_scr[:] = jnp.where(
            col == 0, alive,
            jnp.where(col == 1, jnp.where(live, newF, stateF),
                      jnp.where(col == 2, d_new, 0)))

        # ---- terminal (after processing row 1)
        @pl.when(r == 1)
        def _term():
            d_end = d_new
            j_end = lo + d_end                # row 0: j = 0 + lo + d
            tcol = jax.lax.broadcasted_iota(jnp.int32, (G, 8), 1)
            cur = term_ref[:]
            upd = jnp.where(tcol == 0, j_end,
                            jnp.where(tcol == 1, d_end, 0))
            term_ref[:] = jnp.where((alive == 1), upd, cur)

        return 0

    # Skip 32-row groups above every start row in the tile (batcher
    # sorts instances by length; step words for skipped rows are
    # garbage, never read by the decoder).
    max_si = jnp.max(si_ref[:])

    def group_body(g, _):
        @pl.when(blk_hi - g * 32 - 31 <= max_si)
        def _run():
            jax.lax.fori_loop(g * 32, g * 32 + 32, row_body, 0)
        return 0

    jax.lax.fori_loop(0, RB // 32, group_body, 0)
    steps_ref[:] = acc_scr[:]


def _pick_tile(B: int) -> int:
    """Largest instance tile dividing B, <= 128. Measured on TPU v5e:
    G=128 is ~4.5x faster than G=8 at every production (M, W) shape
    (the walk is a long scalar-ish dependency chain; wide tiles give
    the VPU multiple vregs per op to pipeline), and the kernel's VMEM
    footprint (dirs in-block + word registers) fits at G=128 even for
    M=2048, W=256."""
    for G in (128, 64, 32, 16, 8):
        if B % G == 0:
            return G
    return 8


@functools.partial(jax.jit, static_argnames=("instance_tile", "interpret"))
def traceback_pallas(dirs32, m_len, n_len, lo, start_i, start_d, *,
                     instance_tile=None, interpret=False):
    """Walk dirs32 (int32[B, M/4, W] packed direction words) from
    (start_i, start_d) back to row 0 for every instance.

    Returns (steps int32[B, M], term int32[B, 8]); see module docstring
    for the encoding.
    """
    B, M4, W = dirs32.shape
    M = M4 * 4
    G = instance_tile or _pick_tile(B)
    assert B % G == 0
    RB = 128
    assert M % RB == 0
    n_row_blocks = M // RB

    kernel = functools.partial(_kernel, G=G, W=W, M=M, RB=RB,
                               n_row_blocks=n_row_blocks)
    rev = lambda rb: n_row_blocks - 1 - rb
    scalar_spec = pl.BlockSpec((G, 1), lambda ib, rb: (ib, 0),
                               memory_space=pltpu.VMEM)
    steps, term = pl.pallas_call(
        kernel,
        grid=(B // G, n_row_blocks),
        in_specs=[
            pl.BlockSpec((G, RB // 4, W), lambda ib, rb: (ib, rev(rb), 0),
                         memory_space=pltpu.VMEM),
            scalar_spec, scalar_spec, scalar_spec, scalar_spec,
        ],
        out_specs=[
            pl.BlockSpec((G, RB), lambda ib, rb: (ib, rev(rb)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 8), lambda ib, rb: (ib, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M), jnp.int32),
            jax.ShapeDtypeStruct((B, 8), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, 8), jnp.int32),       # flags (alive, F, lane)
            pltpu.VMEM((G, RB), jnp.int32),      # row-word accumulator
            pltpu.VMEM((G, 8, W), jnp.int32),    # dirs word registers
        ],
        interpret=interpret,
    )(dirs32, m_len.reshape(B, 1), lo.reshape(B, 1),
      start_i.reshape(B, 1), start_d.reshape(B, 1))
    return steps, term
