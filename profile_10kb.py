"""Profile the 10 kb working point with per-stage timers (dev tool)."""
import sys, time, json, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import bench
from lamsa_tpu.pipeline.aln import Aligner, align_reads
from lamsa_tpu.utils.timers import GLOBAL as STATS
from lamsa_tpu.eval import evaluate
from lamsa_tpu import sim

genome, ref, idx, cfg, _ = bench.build_world()
rng10 = np.random.default_rng(bench.SEED + 1)
reads10 = sim.simulate_reads(rng10, genome, 512, read_len=(9000, 11000),
                             sub=0.02, ins=0.04, dele=0.04, sv_fraction=0.15)
a10 = Aligner(ref, idx, cfg)
t0 = time.time()
a10.align_batch(reads10[:128])
print(f"warmup: {time.time()-t0:.1f}s", file=sys.stderr)

# sequential, timed, with stage stats
STATS.reset()
t0 = time.time()
out = []
for c0 in range(128, 512, 128):
    out.extend(a10.align_batch(reads10[c0:c0 + 128]))
dt = time.time() - t0
n = 512 - 128
print(f"sequential: {n/dt:.1f} reads/s ({dt/n*1e3:.2f} ms/read)",
      file=sys.stderr)
print(STATS.report(), file=sys.stderr)

# pipelined
STATS.reset()
t0 = time.time()
out2 = list(align_reads(ref, idx, reads10[128:], cfg, batch_size=128,
                        aligner=a10))
dt2 = time.time() - t0
print(f"pipelined(3): {n/dt2:.1f} reads/s ({dt2/n*1e3:.2f} ms/read)",
      file=sys.stderr)
print(STATS.report(), file=sys.stderr)
st = evaluate(out2, reads10[128:])
print(st.summary(), file=sys.stderr)
