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



def _random_steps(rng, M, density=0.15):
    """Random per-row step words (count | op << 16) + matching compact
    encoding."""
    si = int(rng.integers(1, M + 1))
    steps = np.zeros(M, np.int32)
    ops = rng.integers(0, 2, M)                  # 0=M, 1=I
    cnts = np.where(rng.random(M) < density,
                    rng.integers(1, 90, M), 0)
    steps[:si] = cnts[:si] | (ops[:si] << 16)
    term0 = int(rng.integers(0, 40))
    # compact form
    nw = M // 32
    opbits = np.zeros(nw, np.uint32)
    for idx in range(si):
        if ops[idx]:
            opbits[idx >> 5] |= np.uint32(1 << (idx & 31))
    ev = [(idx << 16) | int(cnts[idx]) for idx in range(si) if cnts[idx]]
    return (steps, term0, si, opbits.view(np.int32),
            np.asarray(ev, np.int32))


@pytest.mark.parametrize("M", [128, 512])
def test_decode_compact_matches_steps(rng, M):
    for _ in range(50):
        steps, term0, si, opbits, ev = _random_steps(rng, M)
        E = max(len(ev), 4)
        events = np.full(E, 0x7FFFFFFF, np.int32)
        events[:len(ev)] = ev
        term = np.array([term0, 0], np.int32)
        want = decode_steps(steps, term, si)
        got = decode_compact(opbits, events, term0, si, len(ev))
        assert got == want


def test_native_decode_compact_matches_python(rng):
    M, B = 128, 64
    nw, E = M // 32, 32
    opb = np.zeros((B, nw), np.int32)
    evs = np.full((B, E), 0x7FFFFFFF, np.int32)
    t0s = np.zeros(B, np.int32)
    sis = np.zeros(B, np.int32)
    nes = np.zeros(B, np.int32)
    specs = []
    for b in range(B):
        steps, term0, si, opbits, ev = _random_steps(rng, M)
        ne = min(len(ev), E)
        opb[b] = opbits
        evs[b, :ne] = ev[:ne]
        t0s[b], sis[b], nes[b] = term0, si, len(ev)
        specs.append((opbits, ev, term0, si, len(ev)))
    got = native.decode_compact_batch(opb, evs, t0s, sis, nes)
    n_overflow = 0
    for b in range(B):
        opbits, ev, term0, si, ne = specs[b]
        if ne > E:
            assert got[b] is None
            n_overflow += 1
        else:
            events = np.full(E, 0x7FFFFFFF, np.int32)
            events[:ne] = ev
            assert cpairs(got[b]) == cpairs(
                decode_compact(opbits, events, term0, si, ne))


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
