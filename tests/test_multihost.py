"""Multi-host orchestration tests.

The single-process paths are tested inline; the real 2-process
jax.distributed flow (read-slice ownership + ordered SAM merge) runs in
spawned subprocesses over the CPU backend — the same mechanism a
2-host pod slice would use over DCN (SURVEY.md section 5 "Distributed
communication backend").
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_single_process_merge_identity():
    from lamsa_tpu.parallel.multihost import merge_sam_shards, my_read_slice
    blobs = [b"batch0", b"batch1"]
    assert merge_sam_shards(blobs) == blobs
    assert my_read_slice(0) and my_read_slice(1)


_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    jax.distributed.initialize(coordinator_address="localhost:{port}",
                               num_processes=2, process_id=pid)
    from lamsa_tpu.parallel.multihost import merge_sam_shards, my_read_slice
    # each process owns alternating batches; 4 batches total
    mine = [f"batch{{i}}-p{{pid}}".encode()
            for i in range(4) if my_read_slice(i)]
    merged = merge_sam_shards(mine)
    if pid == 0:
        assert merged is not None
        got = [m.decode() for m in merged]
        want = [f"batch{{i}}-p{{i % 2}}" for i in range(4)]
        assert got == want, (got, want)
        print("MERGE_OK")
    else:
        assert merged is None
    # skewed shapes: unequal batch counts (5 batches over 2 procs),
    # one huge blob among tiny/empty ones — the streaming per-round
    # merge must stay exact (and only ever pad to the round max)
    blobs = [b"x" * (200_000 if i == 2 else (0 if i == 3 else 7 + i))
             for i in range(5)]
    mine2 = [blobs[i] for i in range(5) if my_read_slice(i)]
    merged2 = merge_sam_shards(mine2)
    if pid == 0:
        assert merged2 == blobs, [len(m) for m in merged2]
        print("SKEW_OK")
    else:
        assert merged2 is None
""")


_ALN_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, {repo!r})
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    jax.distributed.initialize(coordinator_address="localhost:{port}",
                               num_processes=2, process_id=pid)
    import numpy as np
    from lamsa_tpu import sim
    from lamsa_tpu.config import AlignConfig, ScoreParams
    from lamsa_tpu.index.kmer import KmerIndex
    from lamsa_tpu.io.fasta import encode_seq
    from lamsa_tpu.io.refpack import PackedReference
    from lamsa_tpu.io.sam import format_sam_record
    from lamsa_tpu.pipeline.aln import Aligner
    from lamsa_tpu.parallel.multihost import merge_sam_shards, my_read_slice

    # identical world in both processes (seeded)
    rng = np.random.default_rng(1234)
    genome = sim.random_genome(rng, 30000)
    chunks = [np.frombuffer(encode_seq(g.seq), np.uint8) for g in genome]
    offs = np.zeros(len(genome) + 1, np.int64)
    offs[1:] = np.cumsum([len(c) for c in chunks])
    ref = PackedReference(names=[g.name for g in genome], offsets=offs,
                          codes=np.concatenate(chunks),
                          amb_runs=np.zeros((0, 2), np.int64))
    idx = KmerIndex.build(ref.codes, 13)
    reads = sim.simulate_reads(rng, genome, 12, read_len=(400, 1000),
                               sv_fraction=0.3)
    cfg = AlignConfig(scores=ScoreParams(), seed_step=10)
    aligner = Aligner(ref, idx, cfg)
    BS = 4
    batches = [reads[i:i + BS] for i in range(0, len(reads), BS)]

    def blob(batch):
        recs = aligner.align_batch(batch)
        return "".join(format_sam_record(r) + "\\n"
                       for per_read in recs for r in per_read).encode()

    # FULL production pipeline on this process's batch slice only;
    # the ordered merge is the only cross-process step (read-level
    # data parallelism: no cross-host traffic in the align path)
    mine = [blob(b) for i, b in enumerate(batches) if my_read_slice(i)]
    # 1-process reference; BOTH ranks compute it so they reach the
    # interpreter-exit shutdown barrier at about the same time
    want = b"".join(blob(b) for b in batches)
    merged = merge_sam_shards(mine)
    if pid == 0:
        got = b"".join(merged)
        assert got == want, (len(got), len(want))
        print("ALN_MERGE_OK")
""")


@pytest.mark.skipif(os.environ.get("LAMSA_SKIP_MULTIPROC") == "1",
                    reason="multiproc test disabled")
def test_two_process_full_alignment(tmp_path):
    """Full production alignment under jax.distributed: each of 2
    processes aligns its round-robin batch slice through Aligner and
    the ordered SAM merge crosses the process boundary — byte-identical
    to a single-process run (BASELINE config 5 shape, CPU backend)."""
    port = 23522
    script = tmp_path / "aln_worker.py"
    script.write_text(_ALN_WORKER.format(repo=REPO, port=port))
    procs = [subprocess.Popen([sys.executable, str(script), str(pid)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            pytest.fail(f"worker hung: {err[-800:]}")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-800:]
    assert "ALN_MERGE_OK" in outs[0][1]


@pytest.mark.skipif(os.environ.get("LAMSA_SKIP_MULTIPROC") == "1",
                    reason="multiproc test disabled")
def test_two_process_distributed_merge(tmp_path):
    port = 23521
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO, port=port))
    procs = [subprocess.Popen([sys.executable, str(script), str(pid)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            pytest.fail(f"worker hung: {err[-800:]}")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-800:]
    assert "MERGE_OK" in outs[0][1]
    assert "SKEW_OK" in outs[0][1]
