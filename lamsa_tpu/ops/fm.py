"""On-device FM-index operations: batched backward search + SA resolve.

Device mirror of index/fmindex.py host queries, built entirely from
gathers, popcounts and fixed-trip loops (XLA/TPU-friendly — the same
"pure gathers" design SURVEY.md section 7 step 2a prescribes). All row
arithmetic is uint32 (rows < 2^32; no x64 mode).

rank(c, i): checkpoint gather + popcount of 2-bit-matched lanes within
the 64-base block (4 packed words). Resolve: fixed SA_RATE-trip LF-walk
to a value-sampled row (guaranteed to land by construction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

U1 = jnp.uint32(1)
FULL = jnp.uint32(0xFFFFFFFF)


def _rank(c, i, primary, occ_flat, bwt2):
    """# of char c in full-BWT rows [0, i) (sentinel excluded).
    c: int32[...], i: uint32[...]."""
    ip = i - (i > primary).astype(jnp.uint32)
    blk = ip >> 6                                     # checkpoint
    base = occ_flat[(blk << 2) + c.astype(jnp.uint32)]
    rem = (ip & jnp.uint32(63)).astype(jnp.int32)     # bases into block
    pat = (jnp.uint32(0x55555555) * c.astype(jnp.uint32))
    total = jnp.zeros_like(base)
    for o in range(4):
        w = bwt2[(blk << 2) + jnp.uint32(o)]
        y = ~(w ^ pat)
        m = y & (y >> U1) & jnp.uint32(0x55555555)
        cov = jnp.clip(rem - 16 * o, 0, 16)
        mask = jnp.where(cov >= 16, FULL,
                         (U1 << (2 * cov).astype(jnp.uint32)) - U1)
        total += jax.lax.population_count(m & mask)
    return base + total


def _bwt_char(r, primary, bwt2):
    rp = r - (r > primary).astype(jnp.uint32)
    w = bwt2[rp >> 4]
    return ((w >> (2 * (rp & jnp.uint32(15)))) & jnp.uint32(3)) \
        .astype(jnp.int32)


def _mark_bit(r, marks):
    return ((marks[r >> 5] >> (r & jnp.uint32(31))) & U1).astype(jnp.bool_)


def _mark_rank(r, marks, rankcp):
    cp = r >> 6
    base = rankcp[cp]
    rem = (r & jnp.uint32(63)).astype(jnp.int32)
    total = jnp.zeros_like(base)
    for o in range(2):                                # 2 words of 32 rows
        w = marks[(cp << 1) + jnp.uint32(o)]
        cov = jnp.clip(rem - 32 * o, 0, 32)
        mask = jnp.where(cov >= 32, FULL,
                         (U1 << cov.astype(jnp.uint32)) - U1)
        total += jax.lax.population_count(w & mask)
    return base + total


def backward_search(win, win_ok, fm, k: int):
    """Exact backward search of (…, k) nt4 windows.

    fm: dict of device arrays {C (uint32[5]), primary (uint32 scalar),
    occ_flat, bwt2, n_rows (uint32 scalar)}.
    Returns (lo, hi) uint32 row intervals; empty (0,0) where invalid.
    """
    win = jnp.asarray(win)
    shape = win.shape[:-1]
    lo0 = jnp.zeros(shape, jnp.uint32)
    hi0 = jnp.broadcast_to(fm["n_rows"], shape)

    def step(t, carry):
        lo, hi, ok = carry
        c = jnp.clip(jnp.take(win, k - 1 - t, axis=-1), 0, 3)
        lo = fm["C"][c] + _rank(c, lo, fm["primary"], fm["occ_flat"],
                                fm["bwt2"])
        hi = fm["C"][c] + _rank(c, hi, fm["primary"], fm["occ_flat"],
                                fm["bwt2"])
        return lo, hi, ok & (lo < hi)

    lo, hi, ok = jax.lax.fori_loop(0, k, step, (lo0, hi0, win_ok))
    lo = jnp.where(ok, lo, 0)
    hi = jnp.where(ok, hi, 0)
    return lo, hi


def resolve_rows(rows, valid, fm, sa_rate: int):
    """Rows -> text positions via fixed-trip LF-walk (<= sa_rate steps
    to a value-sampled row). Returns uint32 positions (0 where
    invalid)."""
    r0 = jnp.where(valid, rows, 0).astype(jnp.uint32)

    def step(_, carry):
        r, pos, done, steps = carry
        at_p = r == fm["primary"]
        mk = _mark_bit(r, fm["ssa_marks"])
        newly = ~done & (at_p | mk)
        pos = jnp.where(newly & at_p, steps, pos)
        samp = fm["ssa_pos"][_mark_rank(r, fm["ssa_marks"],
                                        fm["ssa_rankcp"])] + steps
        pos = jnp.where(newly & ~at_p, samp, pos)
        done = done | newly
        c = _bwt_char(r, fm["primary"], fm["bwt2"])
        r_next = fm["C"][c] + _rank(c, r, fm["primary"], fm["occ_flat"],
                                    fm["bwt2"])
        return jnp.where(done, r, r_next), pos, done, steps + 1

    _, pos, _, _ = jax.lax.fori_loop(
        0, sa_rate + 1, step,
        (r0, jnp.zeros_like(r0), ~valid, jnp.zeros_like(r0)))
    return jnp.where(pos >= fm["n_rows"], pos - fm["n_rows"], pos)


def device_arrays(fm_host) -> dict:
    """FmIndex (host) -> device array dict for the functions above."""
    import numpy as np

    return {
        "C": jnp.asarray(fm_host.C.astype(np.uint32)),
        "primary": jnp.uint32(fm_host.primary),
        "n_rows": jnp.uint32(fm_host.n + 1),
        "occ_flat": jnp.asarray(fm_host.occ.reshape(-1)),
        "bwt2": jnp.asarray(fm_host.bwt2),
        "ssa_marks": jnp.asarray(fm_host.ssa_marks),
        "ssa_rankcp": jnp.asarray(fm_host.ssa_rankcp),
        "ssa_pos": jnp.asarray(fm_host.ssa_pos),
    }
