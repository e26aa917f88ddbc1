import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from cuzk_tpu.ops import hash_pair_pallas
from cuzk_tpu.field import fr
from cuzk_tpu import oracle
rng = np.random.default_rng(5)
B = int(os.environ.get('BB', '32768')); N = 16
bufs = [(jnp.asarray(rng.integers(0,1<<16,(B,16),np.uint32)), jnp.asarray(rng.integers(0,1<<16,(B,16),np.uint32))) for _ in range(4)]
for _b in bufs[1:]:  # drain every input upload out of the timed region
    _ = np.asarray(hash_pair_pallas(*_b)[0])
out0 = hash_pair_pallas(*bufs[0])
# bit-exactness gate
got = fr.array_to_ints(np.asarray(out0[:2]))
li = fr.array_to_ints(np.asarray(bufs[0][0][:2])); ri = fr.array_to_ints(np.asarray(bufs[0][1][:2]))
assert got == [oracle.hash_pair(a,b) for a,b in zip(li,ri)], "BIT-EXACTNESS FAILED"
t0 = time.perf_counter()
outs = [hash_pair_pallas(*bufs[i%4]) for i in range(N)]
_ = np.asarray(outs[-1][0])
dt = time.perf_counter()-t0
print(f"{N*B/dt:,.0f} h/s  ({dt/N/B*1e9:.0f} ns/hash)  bit-exact OK")
