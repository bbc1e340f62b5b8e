"""Gap filling and end extension (the "frag check" stage).

Mirrors the reference's frag_check + ksw stage (SURVEY.md section 3.3
HOT LOOP #1): within each skeleton part, the gaps between adjacent
anchor blocks are aligned with banded affine-gap DP, the two part ends
are extended with max-cell tracking for soft-clip decisions, and the
per-segment CIGARs are stitched.

TPU shape discipline (SURVEY.md section 5 "Long-context" row): every
gap/end instance from every read in the batch is thrown into one
``DpBatcher``, bucketed by padded query length into static (M, W)
shapes, and executed as a handful of dense batched kernel calls —
length-bucketed batching keeps the DP lanes dense despite wildly
variable gap sizes. Traceback is host-side over the returned direction
bands (ops/traceback.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from lamsa_tpu.io.sam import OP_D, OP_I, OP_M, cigar_pairs
from lamsa_tpu.ops.banded_sw_xla import banded_sw_batch, make_t_window
from lamsa_tpu.ops.oracle import NEG_INF
from lamsa_tpu.ops.traceback import traceback_banded

# (max query length, band width) buckets; instances pick the first
# bucket that fits. Low-drift instances route to W=128 (half the lanes
# AND one fewer prefix-scan step than W=256); high-drift globals and
# long extends need the wide band for path slack.
BUCKETS = ((128, 128), (256, 128), (256, 256), (512, 128), (512, 256),
           (1024, 256), (2048, 256))

# minimum band slack (per side) around the worst-case drift for a
# W=128 global instance; thinner would pinch error excursions
_MIN_SLACK = 24


def _bucket_fits(kind: str, m: int, n: int, M: int, W: int) -> bool:
    if m > M:
        return False
    if kind == "global":
        need = abs(n - m) + 1
        return need <= W - 16 and (W - need) // 2 >= _MIN_SLACK
    # extend: caller caps n <= m + EXT_MARGIN; long extensions
    # accumulate drift, keep them on the wide band
    return (n - m <= W // 2 - 8) and (W == 256 or m <= 256)


# Fixed chunk size per bucket (Pallas path): every kernel call has ONE
# static shape per bucket, so the whole pipeline compiles a closed set
# of signatures (remote compiles cost ~a minute per signature here).
# Padding is nearly free: all-padding instance tiles have max m = 0 and
# the kernels skip every row group. Sizes bound dirs32 HBM to ~256 MB.
CHUNK_BY_M = {(128, 128): 4096, (256, 128): 4096, (256, 256): 2048,
              (512, 128): 2048, (512, 256): 1024, (1024, 256): 512,
              (2048, 256): 256}

# Extra target bases given to end extensions beyond the query length;
# must stay below min(W)//2 - 8 so the band reaches the last DP row.
EXT_MARGIN = 48


_EMPTY_CIGAR = np.empty(0, np.uint32)


def _run(op: int, ln: int) -> np.ndarray:
    return np.array([(ln << 4) | op], np.uint32)


@dataclasses.dataclass
class DpResult:
    score: int
    cigar: np.ndarray           # packed uint32 runs ((len << 4) | op)
    q_used: int                 # query chars consumed
    t_used: int                 # target chars consumed


class DpBatcher:
    """Collect global/extend DP instances, run them bucketed, hand back
    per-instance results by handle. Engine (XLA+host-traceback on CPU,
    Pallas+device-traceback on TPU) is picked by ops/banded_sw.py;
    pass `kernel` only to force a specific XLA-contract kernel (tests).

    device_sources — (flat_read_codes_dev, ref_codes_dev) device arrays
    — switches the Pallas engine to device-side window assembly: the
    enqueue calls then also carry (qd, td) descriptors (see
    ops/banded_sw.py::_dp_tb_fused_gather) and each chunk uploads ~8
    int32 per instance instead of M + (M+W) codes."""

    def __init__(self, scores, kernel=None, device_sources=None,
                 min_band: int = 0, mesh=None):
        self.scores = scores
        self.kernel = kernel
        self.device_sources = device_sources
        # mesh: data-parallel jax.sharding.Mesh — DP chunks shard their
        # instance dim across it (parallel/mesh.py read-level DP)
        self.mesh = mesh
        # min_band: the CLI -w knob — instances route only to buckets
        # with W >= min_band (config.AlignConfig.band_width)
        self.buckets = tuple(b for b in BUCKETS if b[1] >= min_band) \
            or BUCKETS[-1:]
        self._inst: list[dict] = []
        self._results: list[DpResult | None] = []

    def _shard(self, *arrays):
        """Place arrays with the leading dim sharded over the mesh."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from lamsa_tpu.parallel.mesh import DATA_AXIS
        out = [jax.device_put(
            a, NamedSharding(self.mesh, P(DATA_AXIS,
                                          *([None] * (a.ndim - 1)))))
            for a in arrays]
        return tuple(out)

    # ------------------------------------------------------------ enqueue

    def add_global(self, q: np.ndarray, t: np.ndarray, qd=None,
                   td=None) -> int:
        """Global alignment of q vs t (both fully consumed)."""
        idx = len(self._results)
        if len(q) == 0 and len(t) == 0:
            self._results.append(DpResult(0, _EMPTY_CIGAR, 0, 0))
        elif len(q) == 0:
            s = -(self.scores.gap_open + len(t) * self.scores.gap_ext)
            self._results.append(DpResult(s, _run(OP_D, len(t)), 0, len(t)))
        elif len(t) == 0:
            s = -(self.scores.gap_open + len(q) * self.scores.gap_ext)
            self._results.append(DpResult(s, _run(OP_I, len(q)), len(q), 0))
        else:
            self._results.append(None)
            self._inst.append({"idx": idx, "kind": "global",
                               "q": np.asarray(q, np.uint8),
                               "t": np.asarray(t, np.uint8),
                               "qd": qd, "td": td})
        return idx

    def add_extend(self, q: np.ndarray, t: np.ndarray,
                   to_end_bonus: int, qd=None, td=None) -> int:
        """Extension from (0,0) into q/t; soft-clip decision applied:
        result consumes all of q iff to_end >= best - to_end_bonus."""
        idx = len(self._results)
        if len(q) == 0 or len(t) == 0:
            # nothing to extend into (empty query, or anchor at ref edge)
            self._results.append(DpResult(0, _EMPTY_CIGAR, 0, 0))
        else:
            self._results.append(None)
            self._inst.append({"idx": idx, "kind": "extend",
                               "q": np.asarray(q, np.uint8),
                               "t": np.asarray(t, np.uint8),
                               "bonus": to_end_bonus,
                               "qd": qd, "td": td})
        return idx

    # ---------------------------------------------------------------- run

    def run(self) -> None:
        groups: dict[tuple, list] = {}
        for inst in self._inst:
            m, n = len(inst["q"]), len(inst["t"])
            for M, W in self.buckets:
                if _bucket_fits(inst["kind"], m, n, M, W):
                    key = (M, W)
                    break
            else:
                # no bucket fits (pathological gap) — crude fallback
                s = -(2 * self.scores.gap_open
                      + (m + n) * self.scores.gap_ext)
                self._results[inst["idx"]] = DpResult(
                    s, np.concatenate([_run(OP_I, m), _run(OP_D, n)]),
                    m, n)
                continue
            groups.setdefault(key, []).append(inst)
        self._inst = []
        from lamsa_tpu.ops.banded_sw import backend_kind
        pallas = self.kernel is None and backend_kind() == "pallas"
        # Sorting by query length lets the kernels skip row groups above
        # each instance tile's longest query. On the Pallas path ALL
        # chunks are dispatched asynchronously before any is collected,
        # overlapping device work with host<->device round trips.
        launches = []
        for (M, W), insts in sorted(groups.items()):
            insts.sort(key=lambda it: -len(it["q"]))
            chunk = CHUNK_BY_M[(M, W)]
            for c0 in range(0, len(insts), chunk):
                part = insts[c0:c0 + chunk]
                if pallas:
                    launches.append(self._dispatch_pallas(part, M, W))
                else:
                    self._run_group_host(part, M, W)
        for _, _, _, dev in launches:      # overlap all D2H transfers
            try:
                dev.copy_to_host_async()
            except AttributeError:
                pass
        for insts, M, W, dev in launches:
            self._collect_pallas(insts, M, W, dev)

    def _build_arrays(self, insts, M, W, Bp):
        # uint8 halves nothing on device (kernels cast to int32 there)
        # but quarters the host->device upload, the scarce link
        q = np.zeros((Bp, M), np.uint8)
        t_win = np.zeros((Bp, M + W), np.uint8)
        m_len = np.zeros(Bp, np.int32)
        n_len = np.zeros(Bp, np.int32)
        lo = np.zeros(Bp, np.int32)
        is_global = np.zeros(Bp, bool)
        bonus = np.zeros(Bp, np.int32)
        for b, inst in enumerate(insts):
            qq, tt = inst["q"], inst["t"]
            m, n = len(qq), len(tt)
            m_len[b], n_len[b] = m, n
            if inst["kind"] == "global":
                need = abs(n - m) + 1
                lo[b] = min(0, n - m) - (W - need) // 2
                is_global[b] = True
            else:
                # extend callers cap n <= m + EXT_MARGIN < W//2, so the
                # centered band always reaches the last row
                lo[b] = -(W // 2)
                bonus[b] = inst["bonus"]
            q[b, :m] = qq
            t_win[b] = make_t_window(tt, int(lo[b]), M, W)
        return q, t_win, m_len, n_len, lo, is_global, bonus

    # ------------------------------------------------------- pallas engine

    def _dispatch_pallas(self, insts, M, W):
        from lamsa_tpu.ops.banded_sw import (dispatch_group_pallas,
                                             dispatch_group_pallas_gather)
        from lamsa_tpu.utils.timers import GLOBAL as STATS
        Bp = CHUNK_BY_M[(M, W)]   # one static shape per bucket
        gather = (self.device_sources is not None
                  and all(i["qd"] is not None for i in insts))
        with STATS.stage(f"dp_build_{M}x{W}"):
            if gather:
                params = self._build_params(insts, M, W, Bp)
            else:
                arrays = self._build_arrays(insts, M, W, Bp)
        STATS.count(f"dp_cells_{M}x{W}",
                    sum(len(i["q"]) for i in insts) * W)
        STATS.count("dp_instances", len(insts))
        with STATS.stage(f"dp_dispatch_{M}x{W}"):
            if gather:
                if self.mesh is not None:
                    params = dict(zip(params.keys(),
                                      self._shard(*params.values())))
                flat_dev, ref_dev = self.device_sources
                dev = dispatch_group_pallas_gather(params, flat_dev,
                                                   ref_dev, self.scores,
                                                   M, W, mesh=self.mesh)
            else:
                arrays = self._shard(*arrays) if self.mesh is not None \
                    else arrays
                q, t_win, m_len, n_len, lo, is_global, bonus = arrays
                dev = dispatch_group_pallas(q, t_win, m_len, n_len, lo,
                                            is_global, bonus, self.scores,
                                            mesh=self.mesh)
        return insts, M, W, dev

    def _build_params(self, insts, M, W, Bp):
        """Descriptor arrays for the device-gather dispatch: ~8 int32
        per instance on the wire instead of M + (M+W) codes."""
        p = {name: np.zeros(Bp, np.int32) for name in
             ("q_base", "q_step", "q_comp", "t_step", "m_len", "n_len",
              "lo", "bonus")}
        p["t_base"] = np.zeros(Bp, np.uint32)
        p["is_global"] = np.zeros(Bp, bool)
        p["q_step"][:] = 1
        p["t_step"][:] = 1
        for b, inst in enumerate(insts):
            m, n = len(inst["q"]), len(inst["t"])
            qb, qs, qc = inst["qd"]
            tb, ts = inst["td"]
            p["q_base"][b], p["q_step"][b], p["q_comp"][b] = qb, qs, qc
            p["t_base"][b], p["t_step"][b] = tb, ts
            p["m_len"][b], p["n_len"][b] = m, n
            if inst["kind"] == "global":
                need = abs(n - m) + 1
                p["lo"][b] = min(0, n - m) - (W - need) // 2
                p["is_global"][b] = True
            else:
                p["lo"][b] = -(W // 2)
                p["bonus"][b] = inst["bonus"]
        return p

    def _collect_pallas(self, insts, M, W, dev):
        from lamsa_tpu import native
        from lamsa_tpu.ops.banded_sw import collect_group_pallas
        from lamsa_tpu.utils.timers import GLOBAL as STATS
        with STATS.stage(f"dp_collect_{M}x{W}"):
            cigars, score, si, sd = collect_group_pallas(dev, M)
        for b, inst in enumerate(insts):
            m, n = len(inst["q"]), len(inst["t"])
            if inst["kind"] == "global":
                lo_b = min(0, n - m) - (W - (abs(n - m) + 1)) // 2
            else:
                lo_b = -(W // 2)
            i = int(si[b])
            j = i + lo_b + int(sd[b])
            cig = cigars[b]
            if cig is None:
                # compact event budget overflowed on device (rare:
                # > E deletions in one gap) — recompute this instance
                # bit-identically on the host
                cig = native.banded_sw_tb(inst["q"], inst["t"],
                                          self.scores, lo_b,
                                          lo_b + W - 1, i, j)
            self._results[inst["idx"]] = DpResult(int(score[b]), cig, i, j)

    # --------------------------------------------------- host (XLA) engine

    def _run_group_host(self, insts, M, W):
        from lamsa_tpu.ops.banded_sw import backend_kind, run_group_xla
        B = len(insts)
        Bp = max(8, 1 << (B - 1).bit_length())
        if self.mesh is not None:
            n = self.mesh.devices.size
            Bp = -(-Bp // n) * n
        q, t_win, m_len, n_len, lo, is_global, bonus = \
            self._build_arrays(insts, M, W, Bp)

        from lamsa_tpu.utils.timers import GLOBAL as STATS
        STATS.count(f"dp_cells_{M}x{W}", int(m_len.sum()) * W)
        STATS.count("dp_instances", B)
        if self.kernel is not None:
            out, cigar = self._run_explicit(q, t_win, m_len, n_len, lo)
        else:
            zdrop = np.where(is_global, 0,
                             np.int32(self.scores.zdrop)).astype(np.int32)
            args = (q, t_win, m_len, n_len, lo, zdrop)
            if self.mesh is not None:
                # XLA engine under a mesh: shard the instance dim; the
                # row scan partitions along it with no collectives
                args = self._shard(*args)
            out, cigar = run_group_xla(*args[:5], self.scores, args[5])

        best = out["best"]
        for b, inst in enumerate(insts):
            m, n, lo_b = int(m_len[b]), int(n_len[b]), int(lo[b])
            if inst["kind"] == "global":
                i, j, sc = m, n, int(out["global_score"][b])
            else:
                b_score, b_i, b_d = (int(best[b, 0]), int(best[b, 1]),
                                     int(best[b, 2]))
                te_score = int(out["te_score"][b])
                te_j = m + lo_b + int(out["te_d"][b])
                if te_score > -29000 and te_score >= b_score - inst["bonus"]:
                    i, j, sc = m, te_j, te_score
                else:
                    i, j, sc = b_i, b_i + lo_b + b_d, b_score
            self._results[inst["idx"]] = DpResult(sc, cigar(b, i, j), i, j)

    def _run_explicit(self, q, t_win, m_len, n_len, lo):
        """Test hook: run a caller-provided kernel with the XLA-style
        contract (uint8 dirs) and host traceback."""
        sc = self.scores
        res = self.kernel(q.astype(np.int32), t_win.astype(np.int32),
                          m_len, n_len, lo,
                          match=sc.match, mismatch=sc.mismatch,
                          gapo=sc.gap_open, gape=sc.gap_ext)
        from lamsa_tpu.ops.banded_sw import extract_scores
        g, te, te_d = extract_scores(res["h_last"], m_len, n_len, lo)
        dirs = np.asarray(res["dirs"])
        out = {"global_score": np.asarray(g), "te_score": np.asarray(te),
               "te_d": np.asarray(te_d), "best": np.asarray(res["best"])}

        def cigar(b, i, j):
            from lamsa_tpu.native import cigar_to_runs
            return cigar_to_runs(traceback_banded(dirs[b], int(lo[b]),
                                                  i, j))

        return out, cigar

    def result(self, idx: int) -> DpResult:
        r = self._results[idx]
        assert r is not None, "DpBatcher.run() not called or instance lost"
        return r


def compute_nm(q: np.ndarray, t: np.ndarray, cigar) -> int:
    """Edit distance (NM tag) from a stitched CIGAR: mismatches inside
    M runs plus inserted/deleted bases."""
    nm = 0
    i = j = 0
    for op, ln in cigar_pairs(cigar):
        if op == OP_M:
            qs = q[i:i + ln]
            ts = t[j:j + ln]
            nm += int(np.sum((qs != ts) | (qs >= 4) | (ts >= 4)))
            i += ln
            j += ln
        elif op == OP_I:
            nm += ln
            i += ln
        elif op == OP_D:
            nm += ln
            j += ln
        else:  # soft clips consume query only, no edits
            i += ln
    return nm


def md_tag(q: np.ndarray, t: np.ndarray, cigar) -> str:
    """SAM MD:Z tag from the clip-less CIGAR and aligned code windows
    (q = query window, t = reference window). Matches samtools calmd
    semantics: match-run lengths, mismatch ref bases, ^-prefixed
    deletion runs; insertions are invisible to MD."""
    from lamsa_tpu.io.fasta import BASES
    out = []
    run = 0
    i = j = 0
    for op, ln in cigar_pairs(cigar):
        if op == OP_M:
            qs, ts = q[i:i + ln], t[j:j + ln]
            mismatch = (qs != ts) | (qs >= 4) | (ts >= 4)
            for x in range(ln):
                if mismatch[x]:
                    out.append(str(run))
                    run = 0
                    out.append(BASES[int(ts[x])])
                else:
                    run += 1
            i += ln
            j += ln
        elif op == OP_I:
            i += ln
        elif op == OP_D:
            out.append(str(run))
            run = 0
            out.append("^" + "".join(BASES[int(c)] for c in t[j:j + ln]))
            j += ln
        else:
            i += ln
    out.append(str(run))
    return "".join(out)
