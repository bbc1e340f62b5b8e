"""Compact device-traceback encoding (ops/banded_sw.py::_dp_tb_fused
output format): python spec, native decoder, and the overflow
recompute path must all agree with the per-row step-word semantics."""

import numpy as np
import pytest

from lamsa_tpu import native
from lamsa_tpu.config import ScoreParams
from lamsa_tpu.ops.traceback import decode_compact, decode_steps


def cpairs(c):
    """Normalize either CIGAR representation for comparison."""
    from lamsa_tpu.io.sam import cigar_pairs
    return list(cigar_pairs(c))



def _random_steps(rng, M, density=0.15, max_cnt=30):
    """Random per-row step words (count | op << 16) + matching compact
    encoding (16-bit events: (row_idx << 5) | count, count <= 30)."""
    si = int(rng.integers(1, M + 1))
    steps = np.zeros(M, np.int32)
    ops = rng.integers(0, 2, M)                  # 0=M, 1=I
    cnts = np.where(rng.random(M) < density,
                    rng.integers(1, max_cnt + 1, M), 0)
    steps[:si] = cnts[:si] | (ops[:si] << 16)
    term0 = int(rng.integers(0, 40))
    # compact form
    nw = M // 32
    opbits = np.zeros(nw, np.uint32)
    for idx in range(si):
        if ops[idx]:
            opbits[idx >> 5] |= np.uint32(1 << (idx & 31))
    ev = [(idx << 5) | int(cnts[idx]) for idx in range(si) if cnts[idx]]
    return (steps, term0, si, opbits.view(np.int32),
            np.asarray(ev, np.uint16))


def _pack_events(ev, E):
    """uint16 events -> E/2 packed int32 words (0xFFFF padding), the
    on-the-wire layout of ops/banded_sw.py::_dp_tb_core."""
    e16 = np.full(E, 0xFFFF, np.uint16)
    e16[:len(ev)] = ev
    return e16.view(np.int32)


@pytest.mark.parametrize("M", [128, 512])
def test_decode_compact_matches_steps(rng, M):
    for _ in range(50):
        steps, term0, si, opbits, ev = _random_steps(rng, M)
        E = 2 * max((len(ev) + 1) // 2, 4)
        e16 = np.full(E, 0xFFFF, np.uint16)
        e16[:len(ev)] = ev
        term = np.array([term0, 0], np.int32)
        want = decode_steps(steps, term, si)
        got = decode_compact(opbits, e16, term0, si, len(ev))
        assert got == want


def test_decode_compact_overflow_sentinel():
    """n_ev = 0xFFFF (device marks a D run > 30) must decode to None."""
    opbits = np.zeros(4, np.int32)
    e16 = np.full(8, 0xFFFF, np.uint16)
    assert decode_compact(opbits, e16, 0, 64, 0xFFFF) is None


def test_native_decode_compact_matches_python(rng):
    M, B = 128, 64
    nw, E = M // 32, 32
    opb = np.zeros((B, nw), np.int32)
    evs = np.full((B, E // 2), -1, np.int32)     # all-0xFFFF padding
    t0s = np.zeros(B, np.int32)
    sis = np.zeros(B, np.int32)
    nes = np.zeros(B, np.int32)
    specs = []
    for b in range(B):
        steps, term0, si, opbits, ev = _random_steps(rng, M)
        ne = min(len(ev), E)
        opb[b] = opbits
        evs[b] = _pack_events(ev[:ne], E)
        t0s[b], sis[b], nes[b] = term0, si, len(ev)
        specs.append((opbits, ev, term0, si, len(ev)))
    nes[0] = 0xFFFF                              # forced overflow marker
    got = native.decode_compact_batch(opb, evs, t0s, sis, nes)
    assert got[0] is None
    for b in range(1, B):
        opbits, ev, term0, si, ne = specs[b]
        if ne > E:
            assert got[b] is None
        else:
            e16 = np.full(E, 0xFFFF, np.uint16)
            e16[:ne] = ev
            assert cpairs(got[b]) == cpairs(
                decode_compact(opbits, e16, term0, si, ne))


def test_compact_encode_roundtrip_wide(rng):
    """M > 2048 buckets use wide 32-bit events (round-3 fix: narrow
    (row << 5) | cnt events silently overflowed 16 bits at rows >=
    2048, corrupting CIGARs of the (5120, 256) chain_max_dist bucket).
    D events at high rows and runs of 31..8191 must round-trip through
    compact_encode -> collect parse -> native decode; only runs > 8191
    may mark overflow."""
    import jax.numpy as jnp

    from lamsa_tpu.ops.banded_sw import (compact_E, compact_encode,
                                         compact_wide, compact_words)

    M, B = 5120, 8
    assert compact_wide(M)
    steps = np.zeros((B, M), np.int32)
    sis = np.zeros(B, np.int32)
    t0s = np.zeros(B, np.int32)
    for b in range(B):
        si = int(rng.integers(M // 2, M + 1))
        sis[b] = si
        t0s[b] = int(rng.integers(0, 40))
        ops = rng.integers(0, 2, M)
        # sparse runs incl. > 30 (narrow would overflow) at high rows
        cnts = np.where(rng.random(M) < 0.02,
                        rng.integers(1, 200, M), 0)
        cnts[min(3000, si - 1)] = 150          # guaranteed high-row run
        steps[b, :si] = cnts[:si] | (ops[:si] << 16)
    term = np.zeros((B, 8), np.int32)
    term[:, 0] = t0s
    sd = rng.integers(0, 100, B).astype(np.int32)
    score = rng.integers(-500, 500, B).astype(np.int32)

    packed = np.asarray(compact_encode(
        jnp.asarray(steps), jnp.asarray(term), jnp.asarray(sis),
        jnp.asarray(sd), jnp.asarray(score)))

    nw, Ew = M // 32, compact_words(M)
    opb = packed[:, :nw]
    evs = packed[:, nw:nw + Ew]
    tail = packed[:, nw + Ew:]
    assert (tail[:, 1] & 0xFFFF == sis).all()
    assert (tail[:, 2] == score).all()
    n_ev = (tail[:, 0] >> 16) & 0xFFFF
    got = native.decode_compact_batch(opb, evs, tail[:, 0] & 0xFFFF,
                                      sis, n_ev, wide=True)
    for b in range(B):
        si = int(sis[b])
        n_real = int(np.sum((steps[b, :si] & 0xFFFF) > 0))
        if n_real > compact_E(M):
            assert got[b] is None, b
            continue
        want = decode_steps(steps[b], np.array([t0s[b], 0], np.int32), si)
        assert got[b] is not None, b
        assert cpairs(got[b]) == cpairs(want), b


def test_compact_wide_python_fallback_matches_native(rng, monkeypatch):
    """The pure-Python wide decode (no native lib) must agree."""
    import jax.numpy as jnp

    from lamsa_tpu.ops.banded_sw import compact_encode, compact_words

    M, B = 5120, 2
    steps = np.zeros((B, M), np.int32)
    steps[:, 2500] = 40                       # D run, high row
    steps[:, 100] = 1 | (1 << 16)             # I with D run, low row
    sis = np.full(B, 4096, np.int32)
    term = np.zeros((B, 8), np.int32)
    sd = np.zeros(B, np.int32)
    score = np.zeros(B, np.int32)
    packed = np.asarray(compact_encode(
        jnp.asarray(steps), jnp.asarray(term), jnp.asarray(sis),
        jnp.asarray(sd), jnp.asarray(score)))
    nw, Ew = M // 32, compact_words(M)
    n_ev = (packed[:, nw + Ew] >> 16) & 0xFFFF
    args = (packed[:, :nw], packed[:, nw:nw + Ew],
            packed[:, nw + Ew] & 0xFFFF, sis, n_ev)
    want = native.decode_compact_batch(*args, wide=True)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    got = native.decode_compact_batch(*args, wide=True)
    for a, b in zip(want, got):
        assert cpairs(a) == cpairs(b)


def test_banded_sw_tb_matches_oracle(rng):
    """Arbitrary-start traceback recompute (the overflow fallback) must
    equal the oracle walk from the same cell."""
    from lamsa_tpu.ops import oracle
    S = ScoreParams(match=1, mismatch=3, gap_open=2, gap_ext=1)
    for _ in range(20):
        m = int(rng.integers(10, 60))
        q = rng.integers(0, 4, m).astype(np.uint8)
        t = q.copy()
        # mutate
        for _ in range(rng.integers(0, 6)):
            p = int(rng.integers(0, len(t)))
            t[p] = (t[p] + 1) % 4
        lo, hi = -32, 32
        n = len(t)
        si = m
        sj = min(n, si + hi)
        got = native.banded_sw_tb(q, t, S, lo, hi, si, sj)
        _, _, _, dirs = oracle._run_dp(q, t, S, lo, hi)
        want = oracle.traceback(dirs, si, sj)
        assert cpairs(got) == cpairs(want)


def test_banded_sw_tb_python_fallback(rng, monkeypatch):
    from lamsa_tpu.ops import oracle
    S = ScoreParams()
    q = rng.integers(0, 4, 20).astype(np.uint8)
    t = q.copy()
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    got = native.banded_sw_tb(q, t, S, -16, 16, 20, 20)
    _, _, _, dirs = oracle._run_dp(q, t, S, -16, 16)
    assert cpairs(got) == cpairs(oracle.traceback(dirs, 20, 20))


def test_compact_encode_roundtrip(rng):
    """Full encode (ops/banded_sw.py::compact_encode, the device wire
    format) -> collect parse -> decode must reproduce the step-word
    decode, including overflow marking for D runs > 30."""
    import jax.numpy as jnp

    from lamsa_tpu.ops.banded_sw import compact_E, compact_encode

    M, B = 128, 32
    steps = np.full((B, M), 2 << 16, np.int32)     # inactive default
    sis = np.zeros(B, np.int32)
    t0s = np.zeros(B, np.int32)
    specs = []
    for b in range(B):
        # instance 3: a D run of 31 (overflow); others stay <= 30
        st, term0, si, opbits, ev = _random_steps(
            rng, M, max_cnt=31 if b == 3 else 30)
        steps[b] = st
        steps[b, si:] = 2 << 16
        sis[b], t0s[b] = si, term0
        specs.append((st, term0, si))
    term = np.zeros((B, 8), np.int32)
    term[:, 0] = t0s
    sd = rng.integers(0, 100, B).astype(np.int32)
    score = rng.integers(-500, 500, B).astype(np.int32)

    packed = np.asarray(compact_encode(
        jnp.asarray(steps), jnp.asarray(term), jnp.asarray(sis),
        jnp.asarray(sd), jnp.asarray(score)))

    nw, Ew = M // 32, compact_E(M) // 2
    opb = packed[:, :nw]
    evs = packed[:, nw:nw + Ew]
    tail = packed[:, nw + Ew:]
    assert (tail[:, 1] & 0xFFFF == sis).all()
    assert ((tail[:, 1] >> 16) == sd).all()
    assert (tail[:, 2] == score).all()
    n_ev = (tail[:, 0] >> 16) & 0xFFFF
    got = native.decode_compact_batch(opb, evs, tail[:, 0] & 0xFFFF,
                                      sis, n_ev)
    for b in range(B):
        st, term0, si = specs[b]
        cnts = st[:si] & 0xFFFF
        has_big = (cnts > 30).any()
        n_real = sum(1 for r in range(si)
                     if (st[r] & 0xFFFF) > 0 and (st[r] >> 16) != 2)
        if has_big or n_real > compact_E(M):
            assert got[b] is None, b
        else:
            want = decode_steps(st, np.array([term0, 0], np.int32), si)
            assert cpairs(got[b]) == cpairs(want), b
