"""Scan-amortized timing of the fused multislice kernel at tBL_WSe2 scale.

Usage: python scratch/fused_time.py [budget_mb]
budget_mb overrides pallas_multislice._VMEM_BUDGET before planning (bigger
budget -> bigger batch block under the raised Mosaic VMEM ceiling).
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def main():
    budget_mb = float(sys.argv[1]) if len(sys.argv) > 1 else None
    import jax
    import jax.numpy as jnp

    from ptyrad_tpu.ops import pallas_multislice as pm

    if budget_mb is not None:
        pm._VMEM_BUDGET = int(budget_mb * 1024 * 1024)

    b, pmode, nz, n = 32, 6, 6, 128
    print("fwd blk:", pm._pick_blk(b, nz, n, pmode, backward=False),
          "bwd blk:", pm._pick_blk(b, nz, n, pmode, backward=True), flush=True)

    rng = np.random.default_rng(0)
    obja = jnp.asarray(rng.uniform(0.9, 1.0, (b, 1, nz, n, n)).astype(np.float32))
    objp = jnp.asarray(rng.uniform(-0.3, 0.3, (b, 1, nz, n, n)).astype(np.float32))
    pr = jnp.asarray(rng.standard_normal((1, pmode, n, n)).astype(np.float32))
    pi = jnp.asarray(rng.standard_normal((1, pmode, n, n)).astype(np.float32))
    hr = jnp.asarray((1 + 0.1 * rng.standard_normal((1, n, n))).astype(np.float32))
    hi = jnp.asarray((0.1 * rng.standard_normal((1, n, n))).astype(np.float32))

    K = 32

    def f(obja, objp, pr, pi):
        dp = pm.multislice_dp_fused(obja, objp, pr, pi, hr, hi)
        return jnp.sum(jnp.sqrt(dp + 1e-10))

    grad = jax.grad(f, argnums=(0, 1, 2, 3))

    def scan_fn(obja, objp, pr, pi):
        def body(carry, _):
            obja, objp = carry
            g = grad(obja, objp, pr, pi)
            return (obja - 1e-6 * g[0], objp - 1e-6 * g[1]), jnp.sum(g[2])

        (obja, objp), probes = jax.lax.scan(body, (obja, objp), None, length=K)
        return jnp.sum(obja) + jnp.sum(probes)

    fn = jax.jit(scan_fn)
    args = (obja, objp, pr, pi)
    t0 = time.perf_counter()
    compiled = fn.lower(*args).compile()
    print(f"compiled in {time.perf_counter()-t0:.1f}s", flush=True)
    _ = float(compiled(*args))
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        _ = float(compiled(*args))
        times.append(time.perf_counter() - t0)
    best = min(times) / K
    print(f"fused fwd+bwd b={b} nz={nz} n={n} pmode={pmode} "
          f"budget={budget_mb}: {best*1e3:.2f} ms ({b/best:.0f} patterns/s)",
          flush=True)


if __name__ == "__main__":
    main()
