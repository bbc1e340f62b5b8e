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
""")


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
