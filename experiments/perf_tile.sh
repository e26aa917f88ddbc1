#!/bin/bash
cd /root/repo
for tile in 16 32; do
  CUZK_TILE_SUBLANES=$tile timeout 280 python - <<'PY' 2>/dev/null | tail -1
import os, time, numpy as np, jax, jax.numpy as jnp
from cuzk_tpu.ops import hash_pair_pallas
rng = np.random.default_rng(5)
B = 32768; N = 16
bufs = [(jnp.asarray(rng.integers(0,1<<16,(B,16),np.uint32)), jnp.asarray(rng.integers(0,1<<16,(B,16),np.uint32))) for _ in range(4)]
_ = np.asarray(hash_pair_pallas(*bufs[0])[0])
t0 = time.perf_counter()
outs = [hash_pair_pallas(*bufs[i%4]) for i in range(N)]
_ = np.asarray(outs[-1][0])
dt = time.perf_counter()-t0
print(f"tile={os.environ['CUZK_TILE_SUBLANES']}: {N*B/dt:,.0f} h/s")
PY
done
