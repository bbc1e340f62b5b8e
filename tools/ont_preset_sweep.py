"""Measure candidate `ont` presets on the high-error regime.

ONT (non-CCS) reads run ~10-25% total error with a higher substitution
share than PacBio CLR (which is indel-dominated); the round-3 sweep
showed the shared preset holds recall 1.000 through 22% and cliffs at
~25%. Candidates densify seeding and/or soften the mismatch penalty.
The `fm+1edit` row runs the FM backend, where the adaptive re-seed
additionally searches 1-substitution variant pieces (ops/fm.py
backward_search_1edit + union-merge + diagonal voting) — the round-5
GEM ≤e-edit parity path; measured 1.000/1.000 through 30% total error
with the cliff pushed to ~32%.
Output: a table of part_recall / read_acc per (preset, error profile),
CPU engine. Run: python tools/ont_preset_sweep.py [n_reads]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from lamsa_tpu import sim
    from lamsa_tpu.config import AlignConfig, ScoreParams, preset
    from lamsa_tpu.eval import evaluate
    from lamsa_tpu.index.kmer import KmerIndex
    from lamsa_tpu.io.fasta import encode_seq
    from lamsa_tpu.io.refpack import PackedReference
    from lamsa_tpu.pipeline.aln import Aligner

    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    rng = np.random.default_rng(42)
    genome = sim.random_genome(rng, 1_000_000)
    codes = np.frombuffer(encode_seq(genome[0].seq), np.uint8)
    offsets = np.array([0, len(codes)], np.int64)
    ref = PackedReference(names=[genome[0].name], offsets=offsets,
                          codes=codes, amb_runs=np.zeros((0, 2), np.int64))
    idx = KmerIndex.build(codes, 13)

    # ONT-profile error mixes: substitution-heavy
    profiles = {
        "20%": dict(sub=0.10, ins=0.05, dele=0.05),
        "23%": dict(sub=0.12, ins=0.06, dele=0.05),
        "25%": dict(sub=0.13, ins=0.06, dele=0.06),
        "28%": dict(sub=0.15, ins=0.07, dele=0.06),
    }
    from lamsa_tpu.index.fmindex import FmIndex
    fm = FmIndex.build(codes)
    pb = preset("pacbio")
    cands = {
        "pacbio(step10)": (pb, idx),
        "step8": (pb.replace(seed_step=8), idx),
        "step6": (pb.replace(seed_step=6), idx),
        "step8,mm2": (pb.replace(
            seed_step=8,
            scores=ScoreParams(match=1, mismatch=2, gap_open=2,
                               gap_ext=1)), idx),
        "step6,mm2": (pb.replace(
            seed_step=6,
            scores=ScoreParams(match=1, mismatch=2, gap_open=2,
                               gap_ext=1)), idx),
        "fm+1edit(ont)": (preset("ont"), fm),
    }
    print(f"{'preset':16s} " + " ".join(f"{p:>16s}" for p in profiles))
    for cname, (cfg, index) in cands.items():
        row = []
        for pname, prof in profiles.items():
            r2 = np.random.default_rng(7)
            reads = sim.simulate_reads(r2, genome, n_reads,
                                       read_len=(1000, 4000),
                                       sv_fraction=0.2, **prof)
            a = Aligner(ref, index, cfg)
            t0 = time.time()
            st = evaluate(a.align_batch(reads), reads)
            row.append(f"{st.part_recall:.3f}/{st.read_accuracy:.3f}"
                       f" {time.time()-t0:4.0f}s")
        print(f"{cname:16s} " + " ".join(f"{v:>16s}" for v in row),
              flush=True)


if __name__ == "__main__":
    main()
