"""Latency-amortized device-compute probe: many ops per dispatch, one
readback.  Distinguishes 'the chip is slow' from 'the tunnel is slow'."""

import json
import time

import jax
import jax.numpy as jnp


def timed(fn, iters=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    n = 4096
    # Contraction-stable fill: each matmul multiplies magnitudes by n*(1/n)=1,
    # so the chain never drifts toward overflow however long reps grows.
    a = jnp.full((n, n), 1.0 / n, jnp.bfloat16)
    reps = 64

    @jax.jit
    def mm(x):
        def body(c, _):
            return c @ a, ()
        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out

    dt = timed(lambda: float(mm(a)[0, 0].astype(jnp.float32)))
    flops = reps * 2 * n**3
    print(json.dumps({"probe": "mxu_tflops_amortized", "ms": round(dt * 1e3, 1),
                      "value": round(flops / dt / 1e12, 1), "peak_v5e": 197}), flush=True)

    x = jnp.zeros((64, 1024, 1024), jnp.float32)  # 256 MB

    @jax.jit
    def stream(v):
        def body(c, _):
            return c * 1.0000001 + 1.0, ()
        out, _ = jax.lax.scan(body, v, None, length=reps)
        return out

    dt = timed(lambda: float(stream(x)[0, 0, 0]))
    gb = reps * 2 * x.nbytes / 1e9
    print(json.dumps({"probe": "hbm_gbps_amortized", "ms": round(dt * 1e3, 1),
                      "value": round(gb / dt, 1), "peak_v5e": 819}), flush=True)


if __name__ == "__main__":
    main()
