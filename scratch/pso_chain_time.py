"""Time multislice_dp_chain fwd+bwd at PSO scale on the real TPU.

b=32, nz=21 (mega S=10 x sg=2 + ragged 1), n=256, pmode=4, omode=1.
Compares against the committed per-segment-only dispatch via --no-mega.
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def main():
    no_mega = "--no-mega" in sys.argv
    import jax
    import jax.numpy as jnp

    from ptyrad_tpu.ops import cplx, pallas_chain as pch

    if "--bf16" in sys.argv:
        from ptyrad_tpu.ops.fourier import set_matmul_dtype

        set_matmul_dtype("bfloat16")
    for tok in sys.argv[1:]:
        if tok.startswith("--budget="):
            mb = float(tok.split("=")[1])
            pch._VMEM_BUDGET = int(mb * 1024 * 1024)
            pch._MEGA_VMEM_BUDGET = int(mb * 1024 * 1024)
        if tok.startswith("--radix-m="):
            pch.set_radix_m(int(tok.split("=")[1]))

    if no_mega:
        # force the per-segment path by making the mega plan infeasible
        pch._MEGA_VMEM_BUDGET = 0

    b, pmode, omode, nz, n = 32, 4, 1, 21, 256
    rng = np.random.default_rng(0)
    obja = jnp.asarray(rng.uniform(0.9, 1.0, (b, omode, nz, n, n)).astype(np.float32))
    objp = jnp.asarray(rng.uniform(-0.3, 0.3, (b, omode, nz, n, n)).astype(np.float32))
    pr = jnp.asarray(rng.standard_normal((1, pmode, n, n)).astype(np.float32))
    pi = jnp.asarray(rng.standard_normal((1, pmode, n, n)).astype(np.float32))
    hr = jnp.asarray((1 + 0.1 * rng.standard_normal((1, n, n))).astype(np.float32))
    hi = jnp.asarray((0.1 * rng.standard_normal((1, n, n))).astype(np.float32))
    occu = jnp.ones(1, jnp.float32)

    K = 16  # chain steps per dispatch: amortizes the ~30 ms tunnel overhead

    need_dh = "--dh" in sys.argv

    def f(obja, objp, pr, pi, hr, hi):
        dp = pch.multislice_dp_chain(
            obja, objp, cplx.Cplx(pr, pi), cplx.Cplx(hr, hi), occu, 1e-10,
            need_dh=need_dh,
        )
        return jnp.sum(jnp.sqrt(dp + 1e-10))

    grad = jax.grad(f, argnums=(0, 1, 2, 3))

    def scan_fn(obja, objp, pr, pi, hr, hi):
        def body(carry, _):
            obja, objp = carry
            g = grad(obja, objp, pr, pi, hr, hi)
            # feed the gradient back so iterations can't be collapsed
            return (obja - 1e-6 * g[0], objp - 1e-6 * g[1]), jnp.sum(g[2])

        (obja, objp), probes = jax.lax.scan(body, (obja, objp), None, length=K)
        return jnp.sum(obja) + jnp.sum(probes)

    args = (obja, objp, pr, pi, hr, hi)

    def measure(tag):
        # fresh closure per measurement: jax.jit caches on function identity,
        # so a reused scan_fn would NOT retrace after set_far_field()
        def scan_fresh(obja, objp, pr, pi, hr, hi):
            return scan_fn(obja, objp, pr, pi, hr, hi)

        fn = jax.jit(scan_fresh)
        t0 = time.perf_counter()
        compiled = fn.lower(*args).compile()
        print(f"[{tag}] compiled in {time.perf_counter()-t0:.1f}s "
              f"(no_mega={no_mega})", flush=True)
        _ = float(compiled(*args))
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            _ = float(compiled(*args))
            times.append(time.perf_counter() - t0)
        best = min(times) / K
        print(f"[{tag}] chain fwd+bwd b={b} nz={nz} n={n} pmode={pmode}: "
              f"best {best*1e3:.1f} ms ({b/best:.0f} patterns/s) "
              f"(K={K} per dispatch)", flush=True)
        return best

    if "--ab-ff" in sys.argv:
        # interleaved A/B of the in-kernel far-field exit (cancels chip drift)
        pch.set_far_field(True, silent=True)
        on1 = measure("ff-on")
        pch.set_far_field(False, silent=True)
        off1 = measure("ff-off")
        pch.set_far_field(True, silent=True)
        on2 = measure("ff-on2")
        pch.set_far_field(False, silent=True)
        off2 = measure("ff-off2")
        print(f"A/B far_field: on {min(on1, on2)*1e3:.2f} ms vs "
              f"off {min(off1, off2)*1e3:.2f} ms", flush=True)
    else:
        measure("run")


if __name__ == "__main__":
    main()
