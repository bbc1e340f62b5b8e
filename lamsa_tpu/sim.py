"""Read / genome simulator with ground truth.

The reference repo bundled toy test reads (SURVEY.md section 4); that
bundle is unavailable here (empty mount, SURVEY.md section 0), so this
module generates the equivalent: simulated genomes, error-bearing long
reads (PacBio-CLR / ONT-style rates), and SV-spanning reads (deletion,
insertion, inversion, duplication, translocation) with machine-readable
truth for accuracy evaluation — the same external-validation style
(simulate + compare to truth) the reference's paper used.

Truth encoding: read names are ``simread_<n>|<part>;<part>;...`` where
each part is ``ref:start-end:strand:qstart-qend`` in 0-based
half-open concatenated-per-sequence coordinates.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from lamsa_tpu.io.fasta import BASES, FastxRecord

_BASE_IDX = np.arange(4)


def random_genome(rng: np.random.Generator, length: int,
                  n_seqs: int = 1, gc: float = 0.5) -> list[FastxRecord]:
    """Random genome with roughly uniform composition (optionally GC-biased)."""
    p_at = (1.0 - gc) / 2
    p_gc = gc / 2
    probs = np.array([p_at, p_gc, p_gc, p_at])
    out = []
    per = length // n_seqs
    base_bytes = np.frombuffer(b"ACGT", np.uint8)
    for i in range(n_seqs):
        codes = rng.choice(_BASE_IDX, size=per, p=probs)
        seq = base_bytes[codes].tobytes().decode()
        out.append(FastxRecord(name=f"chr{i + 1}", seq=seq))
    return out


def _revcomp(seq: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    return "".join(comp[c] for c in reversed(seq))


def _mutate(rng: np.random.Generator, seq: str, sub: float, ins: float,
            dele: float):
    """Apply a PacBio/ONT-style error model to a perfect read.

    Returns (mutated_seq, qmap) where qmap[i] is the mutated-read
    position of perfect-read position i (len(seq) + 1 entries; deleted
    bases map to the next surviving position) — so truth part
    boundaries can be stated exactly in final-read coordinates.
    Insertions between perfect bases i and i+1 attribute to the left
    side (emitted before qmap[i + 1] is recorded)."""
    out = []
    qmap = np.zeros(len(seq) + 1, np.int64)
    for i, ch in enumerate(seq):
        qmap[i] = len(out)
        r = rng.random()
        if r < dele:
            continue
        if r < dele + sub:
            out.append(BASES[int(rng.integers(4))])
        else:
            out.append(ch)
        while rng.random() < ins:
            out.append(BASES[int(rng.integers(4))])
    qmap[len(seq)] = len(out)
    return "".join(out), qmap


@dataclasses.dataclass
class TruthPart:
    ref_name: str
    ref_start: int
    ref_end: int     # half-open
    strand: str      # '+'/'-'
    q_start: int     # position in the final (error-free) read
    q_end: int

    def encode(self) -> str:
        return (f"{self.ref_name}:{self.ref_start}-{self.ref_end}:"
                f"{self.strand}:{self.q_start}-{self.q_end}")

    @classmethod
    def decode(cls, s: str) -> "TruthPart":
        ref, span, strand, qspan = s.rsplit(":", 3)
        rs, re_ = span.split("-")
        qs, qe = qspan.split("-")
        return cls(ref, int(rs), int(re_), strand, int(qs), int(qe))


def parse_truth(read_name: str) -> list[TruthPart]:
    _, parts = read_name.split("|", 1)
    return [TruthPart.decode(p) for p in parts.split(";")]


def simulate_reads(rng: np.random.Generator, genome: list[FastxRecord],
                   n_reads: int, read_len: tuple[int, int] = (1000, 5000),
                   sub: float = 0.01, ins: float = 0.05, dele: float = 0.04,
                   sv_fraction: float = 0.0,
                   name_prefix: str = "simread") -> list[FastxRecord]:
    """Simulate long reads; a fraction carry one SV (split reads)."""
    reads = []
    for n in range(n_reads):
        want_sv = rng.random() < sv_fraction
        L = int(rng.integers(read_len[0], read_len[1] + 1))
        if want_sv:
            perfect, parts = _simulate_sv_read(rng, genome, L)
        else:
            perfect, parts = _simulate_linear_read(rng, genome, L)
        seq, qmap = _mutate(rng, perfect, sub, ins, dele)
        # truth q intervals in FINAL read coordinates (the error model
        # shifts positions; breakpoint accuracy needs exact truth)
        parts = [dataclasses.replace(p, q_start=int(qmap[p.q_start]),
                                     q_end=int(qmap[p.q_end]))
                 for p in parts]
        name = f"{name_prefix}_{n}|" + ";".join(p.encode() for p in parts)
        reads.append(FastxRecord(name=name, seq=seq))
    return reads


def _pick_window(rng, genome, L):
    lens = np.array([len(g.seq) for g in genome], dtype=np.float64)
    si = int(rng.choice(len(genome), p=lens / lens.sum()))
    g = genome[si]
    if len(g.seq) <= L:
        return si, 0, len(g.seq)
    start = int(rng.integers(0, len(g.seq) - L))
    return si, start, start + L


def _simulate_linear_read(rng, genome, L):
    si, s, e = _pick_window(rng, genome, L)
    g = genome[si]
    frag = g.seq[s:e]
    strand = "+" if rng.random() < 0.5 else "-"
    if strand == "-":
        frag = _revcomp(frag)
    part = TruthPart(g.name, s, e, strand, 0, len(frag))
    return frag, [part]


def _simulate_sv_read(rng, genome, L):
    """Read spanning one SV: the read is two (or three) parts whose
    reference mappings are discontinuous — exactly the split-read cases
    the reference classifies (SURVEY.md section 1 stage 2)."""
    kind = rng.choice(["deletion", "insertion", "inversion",
                       "duplication", "translocation"])
    half = L // 2
    si, s, _ = _pick_window(rng, genome, L * 3 + 1000)
    g = genome[si]

    if kind == "deletion":
        # read = [s, s+half) ++ [s+half+D, s+half+D+half)
        D = int(rng.integers(50, 2000))
        a = g.seq[s:s + half]
        b = g.seq[s + half + D:s + half + D + half]
        parts = [TruthPart(g.name, s, s + half, "+", 0, half),
                 TruthPart(g.name, s + half + D, s + half + D + len(b), "+",
                           half, half + len(b))]
        return a + b, parts

    if kind == "insertion":
        # novel sequence inserted mid-read
        I = int(rng.integers(50, min(1000, max(51, L // 2))))
        novel = "".join(BASES[int(rng.integers(4))] for _ in range(I))
        a = g.seq[s:s + half]
        b = g.seq[s + half:s + L]
        parts = [TruthPart(g.name, s, s + half, "+", 0, half),
                 TruthPart(g.name, s + half, s + L, "+",
                           half + I, half + I + len(b))]
        return a + novel + b, parts

    if kind == "inversion":
        # middle third inverted
        third = L // 3
        a = g.seq[s:s + third]
        m = _revcomp(g.seq[s + third:s + 2 * third])
        b = g.seq[s + 2 * third:s + L]
        parts = [
            TruthPart(g.name, s, s + third, "+", 0, third),
            TruthPart(g.name, s + third, s + 2 * third, "-",
                      third, 2 * third),
            TruthPart(g.name, s + 2 * third, s + L, "+", 2 * third,
                      2 * third + len(b)),
        ]
        return a + m + b, parts

    if kind == "duplication":
        # tandem duplication: segment appears twice in the read
        seg = g.seq[s:s + half]
        b = g.seq[s + half:s + L]
        parts = [
            TruthPart(g.name, s, s + half, "+", 0, half),
            TruthPart(g.name, s, s + half, "+", half, 2 * half),
            TruthPart(g.name, s + half, s + L, "+", 2 * half,
                      2 * half + len(b)),
        ]
        return seg + seg + b, parts

    # translocation: second half from a far-away locus (or other seq);
    # best-effort distance — small toy genomes may not allow 10*L.
    sj, s2, _ = _pick_window(rng, genome, L)
    g2 = genome[sj]
    for _ in range(20):
        if g2.name != g.name or abs(s2 - s) >= 10 * L:
            break
        sj, s2, _ = _pick_window(rng, genome, L)
        g2 = genome[sj]
    a = g.seq[s:s + half]
    b = g2.seq[s2:s2 + half]
    parts = [TruthPart(g.name, s, s + half, "+", 0, half),
             TruthPart(g2.name, s2, s2 + len(b), "+", half, half + len(b))]
    return a + b, parts
