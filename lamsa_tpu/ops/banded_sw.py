"""Backend dispatch for the banded-SW engine.

Two engines share one semantic contract (tested bit-identical):
  * XLA engine (ops/banded_sw_xla.py) + host traceback
    (ops/traceback.py) — used on CPU (tests, dev) and as the spec;
  * Pallas engine (ops/banded_sw_pallas.py) + on-device traceback
    (ops/traceback_pallas.py) — used on TPU; direction data never
    leaves the device (host<->device links are the scarce resource:
    PCIe in production, a ~30 MB/s relay in this dev environment).

`engine()` picks by jax backend; DpBatcher (pipeline/extend.py) calls
through this module only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lamsa_tpu.ops.oracle import NEG_INF


@functools.cache
def backend_kind() -> str:
    b = jax.default_backend()
    return "xla" if b == "cpu" else "pallas"


@functools.partial(jax.jit, static_argnames=())
def extract_scores(h_last, m_len, n_len, lo):
    """Device-side score extraction: global score H[m][n] per instance,
    and the best last-row (to-end) cell for extend clip decisions.
    Returns (global_score [B], te_score [B], te_d [B])."""
    B, W = h_last.shape
    d_g = jnp.clip(n_len - m_len - lo, 0, W - 1)
    g = jnp.take_along_axis(h_last, d_g[:, None], axis=1)[:, 0]
    lanes = jnp.arange(W)[None, :]
    j = m_len[:, None] + lo[:, None] + lanes
    valid = (j >= 0) & (j <= n_len[:, None])
    row = jnp.where(valid, h_last, NEG_INF)
    te = jnp.max(row, axis=1)
    te_d = jnp.argmax(row, axis=1).astype(jnp.int32)
    return g, te, te_d


def run_group_xla(q, t_win, m_len, n_len, lo, scores):
    """XLA engine + host traceback. Returns a 'group result' object the
    batcher post-processes: dict with numpy arrays + a cigar() closure."""
    from lamsa_tpu import native
    from lamsa_tpu.ops.banded_sw_xla import banded_sw_batch

    res = banded_sw_batch(jnp.asarray(q, jnp.int32),
                          jnp.asarray(t_win, jnp.int32), m_len, n_len, lo,
                          match=scores.match, mismatch=scores.mismatch,
                          gapo=scores.gap_open, gape=scores.gap_ext)
    g, te, te_d = extract_scores(res["h_last"], m_len, n_len, lo)
    dirs = np.asarray(res["dirs"])
    out = {
        "global_score": np.asarray(g),
        "te_score": np.asarray(te),
        "te_d": np.asarray(te_d),
        "best": np.asarray(res["best"]),
    }

    def cigar(b: int, i: int, j: int):
        return native.traceback_banded(dirs[b], int(lo[b]), i, j)

    return out, cigar


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gapo",
                                             "gape"))
def _dp_tb_fused(q, t_win, m_len, n_len, lo, is_global, bonus, *, match,
                 mismatch, gapo, gape):
    """Single device dispatch: banded DP -> score extraction -> clip
    decision -> on-device traceback. Returns ONE packed int32 array
    (B, M + 16): [steps | term(8) | score | start_i | start_d | pad...]
    so the host needs exactly one transfer per group.

    q/t_win may arrive uint8 (nt4 codes): the host->device relay is the
    scarce resource, so the batcher uploads 1 byte/base and the cast to
    the kernels' int32 contract happens here, on device."""
    from lamsa_tpu.ops.banded_sw_pallas import banded_sw_pallas
    from lamsa_tpu.ops.traceback_pallas import traceback_pallas

    q = q.astype(jnp.int32)
    t_win = t_win.astype(jnp.int32)
    res = banded_sw_pallas(q, t_win, m_len, n_len, lo, match=match,
                           mismatch=mismatch, gapo=gapo, gape=gape)
    g, te, te_d = extract_scores(res["h_last"], m_len, n_len, lo)
    best = res["best"]
    te_j = m_len + lo + te_d
    # reachability guard: dead last rows floor at -30000 (int16 engine)
    # or NEG_INF (int32); legitimate scores are always > -29000
    use_te = (te > -29000) & (te >= best[:, 0] - bonus)
    si_ext = jnp.where(use_te, m_len, best[:, 1])
    sj_ext = jnp.where(use_te, te_j, best[:, 1] + lo + best[:, 2])
    sc_ext = jnp.where(use_te, te, best[:, 0])
    si = jnp.where(is_global, m_len, si_ext)
    sj = jnp.where(is_global, n_len, sj_ext)
    score = jnp.where(is_global, g, sc_ext)
    sd = (sj - si - lo).astype(jnp.int32)
    steps, term = traceback_pallas(res["dirs32"], m_len, n_len, lo,
                                   si.astype(jnp.int32), sd)
    # repack step words to 16 bits (count:14 | op:2) and pair rows per
    # int32 — halves the device->host payload (the scarce resource)
    count = steps & 0xFFFF
    op = steps >> 16
    s16 = (count & 0x3FFF) | (op << 14)
    packed16 = s16[:, 0::2] | (s16[:, 1::2] << 16)
    B = q.shape[0]
    tail = jnp.concatenate(
        [term, score[:, None], si[:, None].astype(jnp.int32),
         sd[:, None], jnp.zeros((B, 5), jnp.int32)], axis=1)
    return jnp.concatenate([packed16, tail], axis=1)


def dispatch_group_pallas(q, t_win, m_len, n_len, lo, is_global, bonus,
                          scores):
    """Async launch of the fused DP+decide+traceback chain; returns the
    device array (no sync). Pair with collect_group_pallas."""
    return _dp_tb_fused(q, t_win, m_len, n_len, lo, is_global, bonus,
                        match=scores.match, mismatch=scores.mismatch,
                        gapo=scores.gap_open, gape=scores.gap_ext)


def collect_group_pallas(packed_dev, M):
    """Sync one group's packed result; returns (cigars, scores, si, sj
    arrays). Steps arrive 2-rows-per-word (16-bit each)."""
    from lamsa_tpu import native

    M2 = M // 2
    packed = np.asarray(packed_dev)
    steps16 = packed[:, :M2]
    term = packed[:, M2:M2 + 8]
    score = packed[:, M2 + 8]
    si = packed[:, M2 + 9]
    sd = packed[:, M2 + 10]
    cigars = native.decode_steps16_batch(steps16, term, si)
    return cigars, score, si, sd
