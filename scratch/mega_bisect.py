"""Bisect the mega-chain backward TPU compile crash.

Usage: python scratch/mega_bisect.py <case>
  case = fwd | bwd | bwd_nopark | bwd_dense | ...
Each invocation compiles ONE program (subprocess isolation: a compile-helper
crash kills only this process). Prints OK <case> <seconds> on success.
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def main():
    case = sys.argv[1]
    # defaults: PSO scale
    n = 256
    sg = 2
    S = 10
    b = 4          # batch small: block shapes (blk=1) identical, grid shorter
    pmode = 4
    need_dh = False
    park = True
    radix_m = None
    budget_mb = None
    for tok in sys.argv[2:]:
        k, v = tok.split("=")
        if k == "n":
            n = int(v)
        elif k == "S":
            S = int(v)
        elif k == "sg":
            sg = int(v)
        elif k == "pmode":
            pmode = int(v)
        elif k == "b":
            b = int(v)
        elif k == "dh":
            need_dh = v == "1"
        elif k == "park":
            park = v == "1"
        elif k == "radix_m":
            radix_m = int(v)
        elif k == "budget_mb":
            budget_mb = float(v)

    import jax
    import jax.numpy as jnp

    from ptyrad_tpu.ops import pallas_chain as pch

    pch.set_park_maps(park)
    if radix_m is not None:
        pch.set_radix_m(radix_m)
    if budget_mb is not None:
        pch._MEGA_VMEM_BUDGET = int(budget_mb * 1024 * 1024)
    print("plan:", pch._mega_plan(b, sg, n, pmode, True, need_dh), flush=True)
    nz = S * sg

    rng = np.random.default_rng(0)
    pr = jnp.asarray(rng.standard_normal((b, pmode, n, n)).astype(np.float32))
    pi = jnp.asarray(rng.standard_normal((b, pmode, n, n)).astype(np.float32))
    a = jnp.asarray(rng.uniform(0.9, 1.0, (b, nz, n, n)).astype(np.float32))
    p = jnp.asarray(rng.uniform(-0.3, 0.3, (b, nz, n, n)).astype(np.float32))
    hr = jnp.asarray((1 + 0.1 * rng.standard_normal((1, n, n))).astype(np.float32))
    hi = jnp.asarray((0.1 * rng.standard_normal((1, n, n))).astype(np.float32))

    if case == "fwd":
        def f(pr, pi, a, p, hr, hi):
            o_r, o_i = pch.chain_stack(pr, pi, a, p, hr, hi, sg, True, need_dh)
            return jnp.sum(o_r) + jnp.sum(o_i)
    elif case == "bwd":
        def f(pr, pi, a, p, hr, hi):
            def g(*args):
                o_r, o_i = pch.chain_stack(*args, sg, True, need_dh)
                return jnp.sum(o_r) + jnp.sum(o_i)
            grads = jax.grad(g, argnums=(0, 1, 2, 3))(pr, pi, a, p, hr, hi)
            return sum(jnp.sum(x) for x in grads)
    else:
        raise SystemExit(f"unknown case {case}")

    t0 = time.perf_counter()
    lowered = jax.jit(f).lower(pr, pi, a, p, hr, hi)
    compiled = lowered.compile()
    dt = time.perf_counter() - t0
    print(f"COMPILED {case} n={n} S={S} sg={sg} pmode={pmode} b={b} "
          f"park={park} dh={need_dh} in {dt:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = compiled(pr, pi, a, p, hr, hi)
    v = float(out)
    print(f"OK {case} ran in {time.perf_counter()-t0:.1f}s val={v:.4e}", flush=True)


if __name__ == "__main__":
    main()
