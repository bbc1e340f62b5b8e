"""DpBatcher adiag routing: buckets of BOTH band widths (the V=64
W=128 engine is live, commit 8ee4129) split their global instances
into all-global chunks for the antidiagonal engine while extends stay
on the row kernel — every instance must be dispatched exactly once
with the right engine flag, including the mixed bulk+scalar enqueue
whose column merge promotes the glob column to int64 (the round-3
lost-instance bug: int64 0/1 fancy-indexed instead of boolean-masked).
"""

import numpy as np

import lamsa_tpu.pipeline.extend as extend
from lamsa_tpu.config import ScoreParams


def test_columnar_split_routes_every_instance(rng, monkeypatch):
    calls = []

    def fake_dispatch_cols(self, sl, M, W, adiag=False):
        calls.append((M, W, adiag, np.array(sl["glob"], copy=True),
                      np.array(sl["idx"], copy=True)))
        return sl, M, W, None, adiag

    def fake_collect(self, insts, M, W, dev, topdown=False):
        sl = insts
        for b in range(len(sl["idx"])):
            self._results[int(sl["idx"][b])] = extend.DpResult(
                0, extend._EMPTY_CIGAR, 0, 0)

    monkeypatch.setattr(extend.DpBatcher, "_dispatch_cols",
                        fake_dispatch_cols)
    monkeypatch.setattr(extend.DpBatcher, "_collect_pallas",
                        fake_collect)
    import lamsa_tpu.ops.banded_sw as bsw
    monkeypatch.setattr(bsw, "backend_kind", lambda: "pallas")

    b = extend.DpBatcher(ScoreParams(), device_sources=(object(),
                                                        object()))
    # bulk globals landing in a W=256 bucket (high drift forces W=256)
    K = 40
    m = rng.integers(300, 500, K)
    n = m + rng.integers(80, 110, K)          # need > 112 -> W=256
    h0 = b.add_globals_bulk(m, n, np.zeros(K, np.int64), 1, 0,
                            np.arange(K, dtype=np.int64) * 1000)
    # bulk globals with small drift: first-fit lands them in a W=128
    # bucket, which must ALSO route to the adiag engine (V=64 path)
    K2 = 24
    m2 = rng.integers(300, 500, K2)
    n2 = m2 + rng.integers(-10, 10, K2)       # need <= 80 -> W=128 fits
    h2 = b.add_globals_bulk(m2, n2, np.zeros(K2, np.int64), 1, 0,
                            np.arange(K2, dtype=np.int64) * 1000)
    # scalar extends that also fit a W=256 bucket (m > 256)
    hs = [b.add_extend_desc(400, 420, 5, (0, 1, 0), (7, 1))
          for _ in range(3)]
    # scalar global (promotes the merged glob column to int64)
    hg = b.add_global_desc(350, 440, (0, 1, 0), (9, 1))
    b.run()

    for h in ([h0 + i for i in range(K)] + [h2 + i for i in range(K2)]
              + hs + [hg]):
        assert b.result(h) is not None
    seen = set()
    adiag_widths = set()
    for M, W, adiag, glob, idx in calls:
        for i in idx:
            assert i not in seen, "instance dispatched twice"
            seen.add(int(i))
        gb = np.asarray(glob).astype(bool)
        if adiag:
            assert W in (128, 256) and gb.all(), \
                "adiag chunk must be all-global"
            adiag_widths.add(W)
        elif extend._adiag_bucket(M, W):
            assert not gb.any(), "globals must not ride row chunks in " \
                "adiag-eligible buckets"
    assert adiag_widths == {128, 256}, \
        f"both band widths must exercise the adiag engine ({adiag_widths})"
    assert len(seen) == K + K2 + 4
