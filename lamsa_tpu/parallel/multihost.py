"""Multi-host orchestration.

Reference had none (single node, pthreads — SURVEY.md section 2b); the
TPU-native design (BASELINE.json north star) is:

  * ``jax.distributed.initialize()`` across hosts;
  * each host streams its own slice of the FASTQ (round-robin by batch
    index) host-RAM -> HBM — read-level data parallelism, no cross-host
    traffic in the align path;
  * the reference index is replicated per host (a whole-genome k-mer
    index is a few GB — fits host RAM/HBM); for indexes beyond per-chip
    HBM, parallel/sharded_index.py splits the key space across the
    chips of each host and exchanges hit lists over ICI;
  * SAM records are merged in input order via host-side collectives
    (process_allgather on per-batch byte blobs) or, for file sinks,
    per-host shard files concatenated by rank.

This module cannot be exercised on this single-host VM; the sharding
semantics it relies on are validated on a virtual 8-device mesh in
tests/test_parallel.py and via __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import jax


def initialize(coordinator: str | None = None, num_processes: int | None
               = None, process_id: int | None = None) -> None:
    """Initialize jax.distributed when running multi-host; no-op for a
    single process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def my_read_slice(batch_index: int) -> bool:
    """Round-robin batch ownership: host p handles batch i iff
    i % process_count == p. Keeps input-order merge trivial."""
    return batch_index % jax.process_count() == jax.process_index()


def merge_sam_shards(local_blobs: list[bytes]) -> list[bytes] | None:
    """All-gather per-batch SAM blobs to process 0 (which interleaves by
    batch index). Uses process_allgather; returns the ordered blob list
    on process 0, None elsewhere."""
    if jax.process_count() == 1:
        return local_blobs
    from jax.experimental import multihost_utils
    import numpy as np

    # fixed-shape gather: (max_batches, max_len) uint8 padded.
    # process_allgather requires identical shapes on every process, so
    # the row count pads to the GLOBAL max batch count (with
    # round-robin ownership the counts differ by one when the total
    # isn't a multiple of the process count).
    n = len(local_blobs)
    counts = multihost_utils.process_allgather(np.asarray([n]))
    total = int(counts.sum())
    nmax = int(counts.max())
    maxlen = max((len(b) for b in local_blobs), default=0)
    maxlen_all = int(multihost_utils.process_allgather(
        np.asarray([maxlen])).max())
    buf = np.zeros((nmax, maxlen_all + 8), np.uint8)
    for i, b in enumerate(local_blobs):
        buf[i, :8] = np.frombuffer(
            int(len(b)).to_bytes(8, "little"), np.uint8)
        buf[i, 8:8 + len(b)] = np.frombuffer(b, np.uint8)
    gathered = multihost_utils.process_allgather(buf)  # (P, n, L)
    if jax.process_index() != 0:
        return None
    out: list[bytes] = []
    P_, _, _ = gathered.shape
    for i in range(total):
        p = i % P_
        row = gathered[p, i // P_]
        ln = int.from_bytes(row[:8].tobytes(), "little")
        out.append(row[8:8 + ln].tobytes())
    return out
