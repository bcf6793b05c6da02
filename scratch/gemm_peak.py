"""Measure raw MXU matmul throughput on this chip, f32 vs bf16."""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n = 4096
    K = 8
    rng = np.random.default_rng(0)
    a32 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    b32 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))

    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        a, b = a32.astype(dt), b32.astype(dt)

        def scan_fn(a, b):
            def body(carry, _):
                c = jax.lax.dot_general(
                    carry, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dt)
                return c * jnp.asarray(1e-2, dt), jnp.float32(0)

            out, _ = jax.lax.scan(body, a, None, length=K)
            return jnp.sum(out.astype(jnp.float32))

        fn = jax.jit(scan_fn)
        compiled = fn.lower(a, b).compile()
        _ = float(compiled(a, b))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = float(compiled(a, b))
            times.append(time.perf_counter() - t0)
        best = min(times)
        tflops = K * 2 * n**3 / best / 1e12
        print(f"{name}: {best*1e3:.2f} ms for {K} {n}^3 matmuls -> "
              f"{tflops:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
