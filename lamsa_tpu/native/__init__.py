"""ctypes loader for the native host library, with Python fallbacks.

Every entry point degrades gracefully: if g++ or the .so is missing,
callers get the pure-Python implementations (same semantics, slower).
Check `available()` to know which path is live.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_lib = None
_tried = False

MAXC_DEFAULT = 4096


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("LAMSA_TPU_NO_NATIVE"):
        return None
    from lamsa_tpu.native.build import build
    so = build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    i8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    c = ctypes.c_int32
    lib.lamsa_encode_nt4.argtypes = [i8p, ctypes.c_int64, i8p]
    lib.lamsa_revcomp4.argtypes = [i8p, ctypes.c_int64, i8p]
    lib.lamsa_decode_steps.argtypes = [i32p, i32p, i32p, c, c, c, u32p, c,
                                       i32p]
    lib.lamsa_decode_steps.restype = c
    lib.lamsa_decode_steps16.argtypes = [i32p, i32p, i32p, c, c, c, u32p,
                                         c, i32p]
    lib.lamsa_decode_steps16.restype = c
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    lib.lamsa_decode_compact.argtypes = [i32p, u16p, i32p, i32p, i32p, c,
                                         c, c, u32p, c, i32p]
    lib.lamsa_decode_compact.restype = c
    lib.lamsa_decode_compact_wide.argtypes = [i32p, i32p, i32p, i32p,
                                              i32p, c, c, c, u32p, c, i32p]
    lib.lamsa_decode_compact_wide.restype = c
    lib.lamsa_banded_sw_tb.argtypes = [i8p, c, i8p, c, c, c, c, c, c, c,
                                       c, c, u32p, c, i32p]
    lib.lamsa_banded_sw_tb.restype = c
    lib.lamsa_traceback_banded.argtypes = [i8p, c, c, c, c, c, u32p, c,
                                           i32p]
    lib.lamsa_traceback_banded.restype = c
    lib.lamsa_banded_sw_cpu.argtypes = [i8p, c, i8p, c, c, c, c, c, c, c,
                                        i32p, u32p, c, i32p]
    lib.lamsa_banded_sw_cpu.restype = c
    lib.lamsa_nm_from_cigar.argtypes = [i8p, i8p, u32p, c]
    lib.lamsa_nm_from_cigar.restype = ctypes.c_int64
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.lamsa_anchors_to_blocks.argtypes = [i64p, ctypes.c_int64, c, i64p]
    lib.lamsa_anchors_to_blocks.restype = ctypes.c_int64
    lib.lamsa_backtrack_chains.argtypes = [
        i32p, i32p, i32p, i32p, i8p, c, c, c, c, c, c, ctypes.c_double,
        c, i32p, i32p, i32p, i32p]
    lib.lamsa_backtrack_chains.restype = c
    lib.lamsa_sais_u8.argtypes = [i8p, u32p, ctypes.c_int64, c]
    lib.lamsa_sais_u8.restype = c
    lib.lamsa_bwt_from_sa.argtypes = [i8p, u32p, ctypes.c_int64, i8p]
    lib.lamsa_bwt_from_sa.restype = ctypes.c_int64
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _runs_to_cigar(ops: np.ndarray, n: int) -> np.ndarray:
    """Slice one decoded instance out of the shared output buffer.

    Returns the packed uint32 run array itself (the pipeline-wide hot
    CIGAR representation, io/sam.py::cigar_pairs) — copied, because the
    buffer is reused by the next batch."""
    return ops[:n].copy()


# Reused output buffers for the batch decoders. Fresh np.empty of
# B x maxc uint32 costs ~50 us per first-touched page on this VM
# (firecracker EPT faults) — measured 0.8-3 s per 64 MB allocation,
# which dwarfed the actual C decode (0.6 ms). Keyed by shape and
# thread-local: the batch pipeline (pipeline/aln.py align_reads) may
# run two collect loops concurrently.
import threading

_buf_cache = threading.local()


def _out_buffers(B: int, maxc: int):
    cache = getattr(_buf_cache, "d", None)
    if cache is None:
        cache = _buf_cache.d = {}
    key = (B, maxc)
    bufs = cache.get(key)
    if bufs is None:
        bufs = (np.empty((B, maxc), np.uint32), np.empty(B, np.int32))
        bufs[0].fill(0)                 # touch pages once
        cache[key] = bufs
    return bufs


def cigar_to_runs(cigar) -> np.ndarray:
    if isinstance(cigar, np.ndarray):
        return cigar
    return np.asarray([(ln << 4) | op for op, ln in cigar], np.uint32)


def encode_nt4(seq: bytes) -> np.ndarray:
    lib = _load()
    src = np.frombuffer(seq, np.uint8)
    if lib is None:
        from lamsa_tpu.io.fasta import encode_seq
        return np.frombuffer(encode_seq(seq), np.uint8)
    out = np.empty(len(src), np.uint8)
    lib.lamsa_encode_nt4(np.ascontiguousarray(src), len(src), out)
    return out


def revcomp4(codes: np.ndarray) -> np.ndarray:
    lib = _load()
    codes = np.ascontiguousarray(codes, np.uint8)
    if lib is None:
        comp = np.array([3, 2, 1, 0, 4], np.uint8)
        return comp[codes[::-1]]
    out = np.empty(len(codes), np.uint8)
    lib.lamsa_revcomp4(codes, len(codes), out)
    return out


def decode_steps_batch(steps: np.ndarray, term: np.ndarray,
                       start_i: np.ndarray, maxc: int = MAXC_DEFAULT):
    """Batch device-traceback decode. Returns list of CIGARs."""
    lib = _load()
    B, M = steps.shape
    if lib is None:
        from lamsa_tpu.ops.traceback import decode_steps
        return [cigar_to_runs(decode_steps(steps[b], term[b],
                                           int(start_i[b])))
                for b in range(B)]
    steps = np.ascontiguousarray(steps, np.int32)
    term = np.ascontiguousarray(term, np.int32)
    si = np.ascontiguousarray(start_i, np.int32)
    # a decode emits <= 2 runs per DP row + the terminal D run
    maxc = min(maxc, 2 * M + 2)
    out_ops, out_n = _out_buffers(B, maxc)
    lib.lamsa_decode_steps(steps, term, si, B, M, term.shape[1],
                           out_ops.reshape(-1), maxc, out_n)
    res = []
    for b in range(B):
        if out_n[b] < 0:  # overflow: fall back
            from lamsa_tpu.ops.traceback import decode_steps
            res.append(cigar_to_runs(decode_steps(steps[b], term[b],
                                                  int(si[b]))))
        else:
            res.append(_runs_to_cigar(out_ops[b], int(out_n[b])))
    return res


def decode_steps16_batch(steps16: np.ndarray, term: np.ndarray,
                         start_i: np.ndarray, maxc: int = MAXC_DEFAULT):
    """Batch decode of the 16-bit packed step stream."""
    lib = _load()
    B, M2 = steps16.shape
    if lib is None:
        from lamsa_tpu.ops.traceback import decode_steps16
        return [cigar_to_runs(decode_steps16(steps16[b], term[b],
                                             int(start_i[b])))
                for b in range(B)]
    steps16 = np.ascontiguousarray(steps16, np.int32)
    term = np.ascontiguousarray(term, np.int32)
    si = np.ascontiguousarray(start_i, np.int32)
    # rows = 2 * M2; a decode emits <= 2 runs per row + the terminal D
    maxc = min(maxc, 4 * M2 + 2)
    out_ops, out_n = _out_buffers(B, maxc)
    lib.lamsa_decode_steps16(steps16, term, si, B, M2, term.shape[1],
                             out_ops.reshape(-1), maxc, out_n)
    res = []
    for b in range(B):
        if out_n[b] < 0:
            from lamsa_tpu.ops.traceback import decode_steps16
            res.append(cigar_to_runs(decode_steps16(steps16[b], term[b],
                                                    int(si[b]))))
        else:
            res.append(_runs_to_cigar(out_ops[b], int(out_n[b])))
    return res


def decode_compact_batch(opbits: np.ndarray, events: np.ndarray,
                         term0: np.ndarray, start_i: np.ndarray,
                         n_ev: np.ndarray, maxc: int = MAXC_DEFAULT,
                         wide: bool = False):
    """Batch decode of the compact device-traceback output (op bitmap +
    sparse D events; see ops/banded_sw.py::_dp_tb_fused). Narrow
    format: 16-bit events packed 2-per-int32-word; wide (M > 2048
    buckets): one int32 event per word (ops/banded_sw.py compact_wide).
    Instances that overflowed on device (too many events, or a D run
    too long for the count field) decode to None — callers recompute
    those with banded_sw_tb."""
    lib = _load()
    B, nw = opbits.shape
    evs = np.ascontiguousarray(events, np.int32)
    # narrow: little-endian uint16 view, event e of instance b at [b, e]
    evv = evs if wide else evs.view(np.uint16)
    E = evv.shape[1]
    if lib is None:
        from lamsa_tpu.ops.traceback import decode_compact
        res = []
        for b in range(B):
            c = decode_compact(opbits[b], evv[b], int(term0[b]),
                               int(start_i[b]), int(n_ev[b]), wide=wide)
            res.append(None if c is None else cigar_to_runs(c))
        return res
    opbits = np.ascontiguousarray(opbits, np.int32)
    t0 = np.ascontiguousarray(term0, np.int32)
    si = np.ascontiguousarray(start_i, np.int32)
    ne = np.ascontiguousarray(n_ev, np.int32)
    # a decode emits <= 2 runs per DP row + the terminal D run
    maxc = min(maxc, 2 * nw * 32 + 2)
    out_ops, out_n = _out_buffers(B, maxc)
    fn = lib.lamsa_decode_compact_wide if wide else lib.lamsa_decode_compact
    fn(opbits, evv, t0, si, ne, B, nw, E, out_ops.reshape(-1), maxc,
       out_n)
    res = []
    for b in range(B):
        if out_n[b] == -2:              # event overflow: recompute
            res.append(None)
        elif out_n[b] < 0:              # defensive: run-buffer overflow
            from lamsa_tpu.ops.traceback import decode_compact
            res.append(cigar_to_runs(decode_compact(
                opbits[b], evv[b], int(t0[b]), int(si[b]),
                int(ne[b]), wide=wide)))
        else:
            res.append(_runs_to_cigar(out_ops[b], int(out_n[b])))
    return res


def banded_sw_tb(q: np.ndarray, t: np.ndarray, scores, lo: int, hi: int,
                 si: int, sj: int, maxc: int = MAXC_DEFAULT):
    """Banded DP (oracle contract) + traceback from an arbitrary start
    cell (si, sj). Used to recompute instances whose compact device
    traceback overflowed; bit-identical to the device walk."""
    lib = _load()
    q = np.ascontiguousarray(q, np.uint8)
    t = np.ascontiguousarray(t, np.uint8)
    if lib is None:
        from lamsa_tpu.ops import oracle
        _, _, _, dirs = oracle._run_dp(q, t, scores, lo, hi)
        return cigar_to_runs(oracle.traceback(dirs, si, sj))
    out_ops = np.empty(maxc, np.uint32)
    out_n = np.empty(1, np.int32)
    rc = lib.lamsa_banded_sw_tb(q, len(q), t, len(t), scores.match,
                                scores.mismatch, scores.gap_open,
                                scores.gap_ext, lo, hi, si, sj, out_ops,
                                maxc, out_n)
    if rc != 0 or out_n[0] < 0:
        from lamsa_tpu.ops import oracle
        _, _, _, dirs = oracle._run_dp(q, t, scores, lo, hi)
        return cigar_to_runs(oracle.traceback(dirs, si, sj))
    return _runs_to_cigar(out_ops, int(out_n[0]))


def traceback_banded(dirs: np.ndarray, lo: int, i: int, j: int,
                     maxc: int = MAXC_DEFAULT):
    lib = _load()
    if lib is None:
        from lamsa_tpu.ops.traceback import traceback_banded as py
        return cigar_to_runs(py(dirs, lo, i, j))
    M, W = dirs.shape
    out_ops = np.empty(maxc, np.uint32)
    out_n = np.empty(1, np.int32)
    rc = lib.lamsa_traceback_banded(np.ascontiguousarray(dirs, np.uint8),
                                    M, W, lo, i, j, out_ops, maxc, out_n)
    if rc != 0:
        from lamsa_tpu.ops.traceback import traceback_banded as py
        return cigar_to_runs(py(dirs, lo, i, j))
    return _runs_to_cigar(out_ops, int(out_n[0]))


def banded_sw_cpu(q: np.ndarray, t: np.ndarray, scores, lo: int, hi: int,
                  maxc: int = MAXC_DEFAULT):
    """Scalar C++ banded global SW (ksw equivalent). Returns
    (score, cigar) or None if native is unavailable."""
    lib = _load()
    if lib is None:
        return None
    q = np.ascontiguousarray(q, np.uint8)
    t = np.ascontiguousarray(t, np.uint8)
    score = np.empty(1, np.int32)
    out_ops = np.empty(maxc, np.uint32)
    out_n = np.empty(1, np.int32)
    rc = lib.lamsa_banded_sw_cpu(q, len(q), t, len(t), scores.match,
                                 scores.mismatch, scores.gap_open,
                                 scores.gap_ext, lo, hi, score, out_ops,
                                 maxc, out_n)
    if rc != 0:
        raise ValueError(f"banded_sw_cpu failed rc={rc}")
    return int(score[0]), _runs_to_cigar(out_ops, int(out_n[0]))


def backtrack_chains_native(f, pred, qpos, strand, valid, *, k, read_len,
                            min_anchors, min_score, max_chains,
                            max_overlap_frac, keep_secondaries):
    """Native greedy chain selection (pipeline/skeleton.py::
    backtrack_chains is the spec). Returns (chains, alt_score) where
    chains is a list of (idxs int32[n], is_secondary, score, strand,
    read_start, read_end) in encounter order — or None when the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    H = len(f)
    f = np.ascontiguousarray(f, np.int32)
    pred = np.ascontiguousarray(pred, np.int32)
    qpos = np.ascontiguousarray(qpos, np.int32)
    strand = np.ascontiguousarray(strand, np.int32)
    valid = np.ascontiguousarray(valid, np.uint8)
    max_out = max_chains + keep_secondaries + H + 1
    out_idx = np.empty(max(H, 1), np.int32)
    out_off = np.empty(max_out + 1, np.int32)
    out_meta = np.empty(5 * max_out, np.int32)
    out_alt = np.empty(1, np.int32)
    n = lib.lamsa_backtrack_chains(
        f, pred, qpos, strand, valid, H, k, read_len, min_anchors,
        min_score, max_chains, float(max_overlap_frac), keep_secondaries,
        out_idx, out_off, out_meta, out_alt)
    if n < 0:
        return None
    chains = []
    for ci in range(n):
        m = out_meta[5 * ci:5 * ci + 5]
        chains.append((out_idx[out_off[ci]:out_off[ci + 1]].copy(),
                       bool(m[0]), int(m[1]), int(m[2]), int(m[3]),
                       int(m[4])))
    return chains, int(out_alt[0])


def anchors_to_blocks(anchors: np.ndarray, k: int) -> np.ndarray | None:
    """Native chain-anchors -> exact-match blocks; returns None when the
    native library is unavailable (caller falls back to the Python
    spec in pipeline/skeleton.py)."""
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(anchors, np.int64)
    n = len(a)
    out = np.empty((max(n, 1), 3), np.int64)
    m = lib.lamsa_anchors_to_blocks(a.reshape(-1), n, k, out.reshape(-1))
    return out[:m]


def nm_from_cigar(q: np.ndarray, t: np.ndarray, cigar) -> int:
    lib = _load()
    if lib is None:
        from lamsa_tpu.pipeline.extend import compute_nm
        return compute_nm(q, t, cigar)
    runs = cigar_to_runs(cigar)
    return int(lib.lamsa_nm_from_cigar(
        np.ascontiguousarray(q, np.uint8),
        np.ascontiguousarray(t, np.uint8), runs, len(runs)))


def suffix_array(codes: np.ndarray) -> np.ndarray:
    """Suffix array of an nt4 code array (values 0..4), computed with
    native SA-IS over the sentinel-extended text. Returns uint32[n]
    (suffix start offsets of the ORIGINAL text, sentinel excluded)."""
    lib = _load()
    n = len(codes)
    if lib is None:
        # naive fallback for tiny inputs (tests without a compiler)
        return np.array(sorted(range(n),
                               key=lambda i: codes[i:].tobytes()),
                        np.uint32)
    T = np.empty(n + 1, np.uint8)
    T[:n] = np.asarray(codes, np.uint8) + 1
    T[n] = 0
    SA = np.empty(n + 1, np.uint32)
    rc = lib.lamsa_sais_u8(T, SA, n + 1, 7)
    if rc != 0:
        raise ValueError("sais failed")
    return SA[1:].copy()        # drop the sentinel row (always first)


def bwt_from_sa(codes: np.ndarray, sa_full: np.ndarray):
    """BWA-style BWT: returns (bwt uint8[n], primary). sa_full must be
    the sentinel-INCLUDED SA (use _suffix_array_full)."""
    lib = _load()
    n = len(codes)
    bwt = np.empty(n, np.uint8)
    if lib is None:
        primary = -1
        w = 0
        for i, s_ in enumerate(sa_full):
            if s_ == 0:
                primary = i
                continue
            bwt[w] = codes[s_ - 1]
            w += 1
        return bwt, primary
    primary = lib.lamsa_bwt_from_sa(np.ascontiguousarray(codes, np.uint8),
                                    np.ascontiguousarray(sa_full,
                                                         np.uint32),
                                    len(sa_full), bwt)
    return bwt, int(primary)


def suffix_array_full(codes: np.ndarray) -> np.ndarray:
    """Sentinel-included SA (row 0 is the sentinel suffix)."""
    lib = _load()
    n = len(codes)
    if lib is None:
        key = list(np.asarray(codes, np.int16) + 1) + [0]
        return np.array(sorted(range(n + 1),
                               key=lambda i: key[i:]), np.uint32)
    T = np.empty(n + 1, np.uint8)
    T[:n] = np.asarray(codes, np.uint8) + 1
    T[n] = 0
    SA = np.empty(n + 1, np.uint32)
    rc = lib.lamsa_sais_u8(T, SA, n + 1, 7)
    if rc != 0:
        raise ValueError("sais failed")
    return SA
