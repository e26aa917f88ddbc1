"""Perf experiments for the Poseidon pair-hash kernel on the real TPU."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp

def bench(fn, args, iters=30, label=""):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    B = args[0].shape[0]
    print(f"{label}: {iters*B/dt:,.0f} hashes/s ({dt/iters/B*1e9:.1f} ns/hash, batch {B})")
    return iters * B / dt

def main():
    from cuzk_tpu.ops import hash_pair_pallas
    import cuzk_tpu.ops.poseidon_pallas as pp
    rng = np.random.default_rng(1)
    for B in (4096, 16384, 65536):
        l = jnp.asarray(rng.integers(0, 1<<16, (B, 16), np.uint32))
        r = jnp.asarray(rng.integers(0, 1<<16, (B, 16), np.uint32))
        bench(hash_pair_pallas, (l, r), label=f"pallas B={B}")
    # XLA (non-pallas) slab path on TPU for comparison
    orig = pp._on_tpu
    pp._on_tpu = lambda: False
    slab_jnp = jax.jit(lambda l, r: pp._sponge_pallas.__wrapped__(jnp.stack([l, r], axis=1), 2))
    B = 16384
    l = jnp.asarray(rng.integers(0, 1<<16, (B, 16), np.uint32))
    r = jnp.asarray(rng.integers(0, 1<<16, (B, 16), np.uint32))
    bench(slab_jnp, (l, r), label=f"xla-slab B={B}")
    pp._on_tpu = orig

if __name__ == "__main__":
    main()
