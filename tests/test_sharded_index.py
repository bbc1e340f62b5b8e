"""Sharded-index seeding (parallel/sharded_index.py) vs the replicated
path: the two modes must produce bit-identical hit arrays, so the rest
of the pipeline cannot tell them apart (PARITY.md "sharded index" row;
SURVEY.md section 5 distributed-backend row)."""

import numpy as np
import pytest

import jax

from lamsa_tpu import sim
from lamsa_tpu.config import AlignConfig
from lamsa_tpu.index.kmer import KmerIndex
from lamsa_tpu.io.fasta import encode_seq
from lamsa_tpu.parallel.mesh import make_mesh, shard_batch
from lamsa_tpu.parallel.sharded_index import (place_sharded,
                                              seed_chain_step_sharded,
                                              seed_hits_sharded,
                                              shard_kmer_index)
from lamsa_tpu.pipeline.seeding import make_qpos_grid, seed_hits


def _world(rng, genome_len=30000, B=16, L=512):
    cfg = AlignConfig(seed_step=10)
    genome = sim.random_genome(rng, genome_len)
    codes = np.frombuffer(encode_seq(genome[0].seq), np.uint8)
    idx = KmerIndex.build(codes, 13)
    reads = sim.simulate_reads(rng, genome, B, read_len=(L // 2, L - 8),
                               sub=0.02, ins=0.03, dele=0.03)
    rc = np.full((B, L), 4, np.int32)
    rl = np.zeros(B, np.int32)
    for i, r in enumerate(reads):
        c = np.frombuffer(encode_seq(r.seq), np.uint8)[:L]
        rc[i, :len(c)] = c
        rl[i] = len(c)
    grid = make_qpos_grid(L, idx.k, cfg.seed_step)
    return cfg, idx, rc, rl, grid


def test_shard_kmer_index_partitions(rng):
    _, idx, _, _, _ = _world(rng)
    D = 8
    sh = shard_kmer_index(idx, D)
    assert sh["keys"].shape[0] == D
    # every real key appears exactly once across shards, with its
    # positions reachable through the rebased starts
    seen = 0
    for d in range(D):
        real = sh["counts"][d] > 0
        for i in np.nonzero(real)[0][:20]:      # spot-check per shard
            key = sh["keys"][d, i]
            s, c = sh["starts"][d, i], sh["counts"][d, i]
            got = sh["positions"][d, s:s + c].astype(np.int64)
            expect = idx.lookup_host(int(key))
            assert np.array_equal(got, expect)
        seen += int(real.sum())
    assert seen == len(idx.keys)


def test_sharded_seeding_matches_replicated(rng):
    cfg, idx, rc, rl, grid = _world(rng)
    mesh = make_mesh()
    common = dict(k=idx.k, cands_per_seed=cfg.max_cands_per_seed,
                  max_hits=cfg.max_hits_per_read)

    ref = seed_hits(rc, rl, grid, idx.keys, idx.starts, idx.counts,
                    idx.positions.astype(np.uint32), **common)

    sh = place_sharded(mesh, shard_kmer_index(idx, mesh.devices.size))
    rc_d, rl_d = shard_batch(mesh, rc, rl)
    got = seed_hits_sharded(rc_d, rl_d, grid, sh["keys"], sh["starts"],
                            sh["counts"], sh["positions"], mesh=mesh,
                            **common)
    for name in ("qpos", "rpos", "strand", "valid"):
        assert np.array_equal(np.asarray(got[name]), np.asarray(ref[name])), \
            f"{name} differs between sharded and replicated seeding"
    assert np.asarray(ref["valid"]).any()       # non-trivial comparison


def test_sharded_seed_chain_step(rng):
    cfg, idx, rc, rl, grid = _world(rng, B=8, L=256)
    mesh = make_mesh()
    from lamsa_tpu.parallel.mesh import seed_chain_step
    common = dict(k=idx.k, cands_per_seed=cfg.max_cands_per_seed,
                  max_hits=cfg.max_hits_per_read, weight=idx.k,
                  lookback=cfg.chain_lookback, max_dist=cfg.chain_max_dist,
                  diag_slack=cfg.chain_diag_slack)
    ref = seed_chain_step(rc, rl, grid, idx.keys, idx.starts, idx.counts,
                          idx.positions.astype(np.uint32), **common)
    sh = place_sharded(mesh, shard_kmer_index(idx, mesh.devices.size))
    rc_d, rl_d = shard_batch(mesh, rc, rl)
    got = seed_chain_step_sharded(rc_d, rl_d, grid, sh["keys"],
                                  sh["starts"], sh["counts"],
                                  sh["positions"], mesh=mesh, **common)
    for name in ("f", "pred"):
        assert np.array_equal(np.asarray(got[name]), np.asarray(ref[name]))


def test_sharded_index_memory_drops(rng):
    """The point of the mode: per-chip positions memory ~ 1/D."""
    _, idx, _, _, _ = _world(rng)
    D = 8
    sh = shard_kmer_index(idx, D)
    per_chip = sh["positions"].shape[1]
    total = len(idx.positions)
    assert per_chip <= total // D + total // (2 * D) + 64
