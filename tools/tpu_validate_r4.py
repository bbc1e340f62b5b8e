"""Round-4 TPU validation: packed-word gathers, fused-chunk timing,
(5120, 256) adiag compile, FM record-gather timing.

Run sections selectively:  python tools/tpu_validate_r4.py gather fused
Sections: gather fused adiag5120 fm
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(f"[r4] {m}", flush=True)


def sec_gather():
    """gather_windows on TPU vs host assembly (bit-exact)."""
    import jax

    from lamsa_tpu.ops.banded_sw import gather_windows, pack_codes_words
    from lamsa_tpu.ops.banded_sw_xla import make_t_window

    rng = np.random.default_rng(1)
    M, W = 128, 256
    ref = rng.integers(0, 5, 100000).astype(np.uint8)
    flat = rng.integers(0, 5, 50000).astype(np.uint8)
    B = 64
    qb = rng.integers(0, 40000, B).astype(np.int32)
    qs = np.where(rng.random(B) < 0.5, 1, -1).astype(np.int32)
    qb = np.where(qs < 0, qb + M, qb).astype(np.int32)
    qc = rng.integers(0, 2, B).astype(np.int32)
    tb = rng.integers(200, 90000, B).astype(np.uint32)
    ts = np.where(rng.random(B) < 0.5, 1, -1).astype(np.int32)
    ml = rng.integers(1, M + 1, B).astype(np.int32)
    nl = (ml + rng.integers(-30, 31, B)).clip(1).astype(np.int32)
    lo = (np.minimum(0, nl - ml) - (W - (np.abs(nl - ml) + 1)) // 2)
    lo = (lo - (lo & 1)).astype(np.int32)

    fd = jax.device_put(pack_codes_words(flat))
    rd = jax.device_put(pack_codes_words(ref))
    q_dev, t_dev = gather_windows(fd, rd, qb, qs, qc, tb, ts, ml, nl, lo,
                                  M=M, W=W)
    q_dev, t_dev = np.asarray(q_dev), np.asarray(t_dev)
    bad = 0
    for b in range(B):
        m = int(ml[b])
        y = qb[b] + qs[b] * np.arange(m)
        q = flat[y].astype(np.int32)
        if qc[b]:
            q = np.where(q < 4, 3 - q, q)
        nb = int(nl[b])
        x = int(tb[b]) + int(ts[b]) * np.arange(nb)
        t = ref[x].astype(np.uint8)
        want_t = make_t_window(t, int(lo[b]), M, W)
        if not (np.array_equal(q_dev[b, :m], q)
                and (q_dev[b, m:] == 4).all()
                and np.array_equal(t_dev[b], want_t)):
            bad += 1
            log(f"MISMATCH case {b}")
    log(f"gather parity on TPU: {B - bad}/{B} exact")
    assert bad == 0


def sec_fused():
    """Dispatch-free fused chunk timing (the new scored bench unit)."""
    import bench
    g_fused, g_adiag, g_row = bench.bench_kernel()
    log(f"fused={g_fused:.2f} adiag_bare={g_adiag:.2f} row={g_row:.2f}")


def sec_adiag5120():
    """(5120, 256) adiag chain: TPU compile + wire equality vs row
    engine (ungate gate: extend._adiag_bucket)."""
    import jax

    from lamsa_tpu.config import ScoreParams
    from lamsa_tpu.ops.banded_sw import (_dp_tb_adiag_upload,
                                         _dp_tb_fused, global_lo,
                                         collect_group_pallas)
    from lamsa_tpu.ops.banded_sw_xla import make_t_window

    S = ScoreParams()
    rng = np.random.default_rng(2)
    M, W, B = 5120, 256, 128
    q = np.zeros((B, M), np.int32)
    t_win = np.full((B, M + W), 5, np.int32)
    ml = np.zeros(B, np.int32)
    nlv = np.zeros(B, np.int32)
    lo = np.zeros(B, np.int32)
    for b in range(B):
        m = int(rng.integers(2100, 5001))
        t = rng.integers(0, 4, m).astype(np.int32)
        qq = t.copy()
        sub = rng.random(m) < 0.08
        qq[sub] = rng.integers(0, 4, int(sub.sum()))
        drift = int(rng.integers(-80, 81))
        t2 = np.concatenate([t, rng.integers(0, 4, max(drift, 0))])[
            :m + drift].astype(np.int32)
        n = len(t2)
        ml[b], nlv[b] = m, n
        lo[b] = global_lo(m, n, W)
        q[b, :m] = qq
        t_win[b] = make_t_window(t2, int(lo[b]), M, W)
    kw = dict(match=S.match, mismatch=S.mismatch, gapo=S.gap_open,
              gape=S.gap_ext)
    t0 = time.time()
    wire_a = np.asarray(_dp_tb_adiag_upload(
        q, t_win, ml, nlv, lo, M=M, **kw))
    log(f"adiag (5120,256) compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    wire_a2 = np.asarray(_dp_tb_adiag_upload(
        q, t_win, ml, nlv, lo, M=M, **kw))
    log(f"adiag (5120,256) steady: {time.time()-t0:.2f}s")
    assert np.array_equal(wire_a, wire_a2)
    ca, sa, sia, sda = collect_group_pallas(wire_a, M, topdown=True)

    is_g = np.ones(B, bool)
    bonus = np.zeros(B, np.int32)
    t0 = time.time()
    wire_r = np.asarray(_dp_tb_fused(q, t_win, ml, nlv, lo, is_g, bonus,
                                     **kw, zdrop=S.zdrop))
    log(f"row (5120,256) compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    _ = np.asarray(_dp_tb_fused(q, t_win, ml, nlv, lo, is_g, bonus,
                                **kw, zdrop=S.zdrop))
    log(f"row (5120,256) steady: {time.time()-t0:.2f}s")
    cr, sr, sir, sdr = collect_group_pallas(wire_r, M, topdown=False)
    assert np.array_equal(sa, sr), "scores differ"
    nfall = 0
    for b in range(B):
        if ca[b] is None or cr[b] is None:
            nfall += 1
            continue
        assert np.array_equal(ca[b], cr[b]), f"cigar {b} differs"
    log(f"adiag vs row on TPU: scores equal, cigars equal "
        f"({B - nfall}/{B} on-device, {nfall} overflow fallbacks)")


def sec_fm():
    """FM record-gather timing on TPU: backward search + resolve at the
    config-4 shape (B=128 reads x S windows)."""
    import jax
    import jax.numpy as jnp

    from lamsa_tpu.index.fmindex import FmIndex
    from lamsa_tpu.ops import fm as fmops

    rng = np.random.default_rng(3)
    n = 1 << 22                        # 4 Mb host build is fast
    codes = rng.integers(0, 4, n).astype(np.uint8)
    t0 = time.time()
    fm = FmIndex.build(codes)
    log(f"FM build ({n/1e6:.0f} Mb): {time.time()-t0:.1f}s")
    dev = fmops.device_arrays(fm)
    dev = {k: jax.device_put(v) for k, v in dev.items()}

    B, S, k = 128, 1024, 16
    starts = rng.integers(0, n - k, (B, S))
    win = np.stack([codes[s:s + k] for s in starts.reshape(-1)]) \
        .reshape(B, S, k).astype(np.int32)
    ok = np.ones((B, S), bool)

    bs = jax.jit(lambda w, o: fmops.backward_search(w, o, dev, k))
    lo, hi = bs(win, ok)
    lo.block_until_ready()
    t0 = time.time()
    for _ in range(5):
        lo, hi = bs(win, ok)
    lo.block_until_ready()
    dt = (time.time() - t0) / 5
    log(f"backward_search B={B} S={S} k={k}: {dt*1e3:.1f} ms/call "
        f"({B*S*k/dt/1e6:.1f} M rank-pairs/s)")

    H = 4096
    rows = np.minimum(np.asarray(lo)[:, :H // 32].repeat(32, axis=1)
                      .reshape(B, -1)[:, :H], fm.n).astype(np.uint32)
    valid = np.ones((B, H), bool)
    rs = jax.jit(lambda r, v: fmops.resolve_rows(r, v, dev, fm.sa_rate))
    pos = rs(rows, valid)
    pos.block_until_ready()
    t0 = time.time()
    for _ in range(5):
        pos = rs(rows, valid)
    pos.block_until_ready()
    dt = (time.time() - t0) / 5
    log(f"resolve_rows B={B} H={H} sa_rate={fm.sa_rate}: "
        f"{dt*1e3:.1f} ms/call ({B*H/dt/1e6:.2f} M resolves/s)")


if __name__ == "__main__":
    which = sys.argv[1:] or ["gather", "fused", "adiag5120", "fm"]
    import jax
    log(f"backend: {jax.default_backend()}")
    for w in which:
        globals()[f"sec_{w}"]()
