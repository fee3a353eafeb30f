import numpy as np, jax, jax.numpy as jnp, time, sys
from spfx.kernels import pallas_blocks as pb
cp, rbp, B = 16, 1024, 64
w = jnp.full((B,), cp, jnp.int32); nb = jnp.full((B,), rbp, jnp.int32)
key = jax.random.PRNGKey(0)
D = jax.random.normal(key, (cp, cp, B), jnp.float32)
D = D + jnp.swapaxes(D,0,1) + 2*cp*jnp.eye(cp)[:, :, None]
Bm = jax.random.normal(key, (rbp, cp, B), jnp.float32)
t0=time.time()
dd, db = pb.chol_panel_deltas_lanes(w, nb, D, Bm, cp=cp, rbp=rbp)
dd.block_until_ready()
print("ok", time.time()-t0, float(jnp.abs(dd).max()), float(jnp.abs(db).max()))
