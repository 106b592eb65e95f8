"""Unrolled vs scanned op-chain: detects per-HLO-op execution overhead.

Both programs do 64 chained 2048^2 bf16 matmuls (identical FLOPs).  The
scan compiles to ONE while-loop HLO; the unrolled version to ~64 separate
fusions.  A large gap means the runtime charges per executed op — which a
big flat graph (the distillation step) pays thousands of times.
"""

import json
import time

import jax
import jax.numpy as jnp

N = 2048
REPS = 64


def timed(fn, iters=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    a = jnp.full((N, N), 0.001, jnp.bfloat16)

    @jax.jit
    def scanned(x):
        def body(c, _):
            return c @ a, ()
        out, _ = jax.lax.scan(body, x, None, length=REPS)
        return out

    @jax.jit
    def unrolled(x):
        for _ in range(REPS):
            x = x @ a
        return x

    dt_s = timed(lambda: float(scanned(a)[0, 0].astype(jnp.float32)))
    dt_u = timed(lambda: float(unrolled(a)[0, 0].astype(jnp.float32)))
    print(json.dumps({"probe": "scan_64_matmuls_ms", "value": round(dt_s * 1e3, 1)}), flush=True)
    print(json.dumps({"probe": "unrolled_64_matmuls_ms", "value": round(dt_u * 1e3, 1),
                      "per_op_overhead_ms": round((dt_u - dt_s) / REPS * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
