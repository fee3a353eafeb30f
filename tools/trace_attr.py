"""Capture a jax.profiler device trace of ONE warm factorize and aggregate
HLO op durations from the xplane — exact attribution, no substitution
artifacts."""
import glob, os, sys, time, collections
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from spfx.io import generate
from spfx.utils.config import Config
from spfx.chol.factorize import Cholesky
from spfx.kernels.mega import MegaRunner

def sync(x): return float(np.asarray(jnp.sum(x)))

G = int(os.environ.get("G", "48"))
A = generate.laplacian_3d(G)
cfg = Config(dtype="float32", ordering="nd", engine="mega",
             matmul_precision="highest",
             class_min=int(os.environ.get("SPFX_CLASS_MIN", "8")))
ctx = Cholesky(A, cfg)
r = MegaRunner(ctx.plan, lu=False, config=cfg)
(vals,) = ctx.entry_values(A)
sync(r.run(vals))                  # compile + warm
t0 = time.perf_counter()
sync(r.run(vals))
print(f"warm factorize: {time.perf_counter()-t0:.2f}s", flush=True)

trace_dir = "/tmp/spfx_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    sync(r.run(vals))

# parse xplane
from tensorflow.tsl.profiler.protobuf import xplane_pb2
files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
print("trace files:", files, flush=True)
tot = collections.Counter()
cnt = collections.Counter()
for f in files:
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(f, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if "step" in line.name.lower():
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                tot[name] += ev.duration_ps / 1e12
                cnt[name] += 1
print("== top ops by device time ==", flush=True)
total = sum(tot.values())
for name, t in tot.most_common(40):
    print(f"{t*1e3:9.1f} ms  x{cnt[name]:<7d} {name[:110]}", flush=True)
print(f"total accounted: {total*1e3:.0f} ms", flush=True)
