"""Accuracy evaluation against simulator truth.

The reference's validation style (SURVEY.md section 4): simulated reads
with known origin, aligner output compared to truth. A read part is
"correct" if some SAM record overlaps its true reference interval on the
right strand and sequence.
"""

from __future__ import annotations

import dataclasses

from lamsa_tpu.io.sam import FLAG_REVERSE, FLAG_UNMAPPED, cigar_ref_len
from lamsa_tpu.sim import parse_truth


@dataclasses.dataclass
class EvalStats:
    n_reads: int = 0
    n_parts: int = 0
    parts_found: int = 0
    reads_all_parts: int = 0
    n_unmapped: int = 0
    n_records: int = 0

    @property
    def part_recall(self) -> float:
        return self.parts_found / max(1, self.n_parts)

    @property
    def read_accuracy(self) -> float:
        return self.reads_all_parts / max(1, self.n_reads)

    def summary(self) -> str:
        return (f"reads={self.n_reads} part_recall={self.part_recall:.3f} "
                f"read_acc={self.read_accuracy:.3f} "
                f"unmapped={self.n_unmapped}")


def _rec_interval(rec):
    return rec.pos, rec.pos + cigar_ref_len(rec.cigar)


def evaluate(records_per_read, reads, slack: int = 200) -> EvalStats:
    """records_per_read: list (per read, input order) of [SamRecord].
    reads: matching FastxRecords with truth-encoded names."""
    st = EvalStats()
    for read, recs in zip(reads, records_per_read):
        truth = parse_truth(read.name)
        st.n_reads += 1
        st.n_parts += len(truth)
        mapped = [r for r in recs if not (r.flag & FLAG_UNMAPPED)]
        st.n_records += len(mapped)
        if not mapped:
            st.n_unmapped += 1
            continue
        found = 0
        for p in truth:
            want_rev = p.strand == "-"
            ok = False
            for rec in mapped:
                if rec.rname != p.ref_name:
                    continue
                if bool(rec.flag & FLAG_REVERSE) != want_rev:
                    continue
                s, e = _rec_interval(rec)
                if s < p.ref_end + slack and e > p.ref_start - slack:
                    inter = min(e, p.ref_end) - max(s, p.ref_start)
                    if inter >= 0.5 * (p.ref_end - p.ref_start):
                        ok = True
                        break
            found += ok
        st.parts_found += found
        if found == len(truth):
            st.reads_all_parts += 1
    return st
