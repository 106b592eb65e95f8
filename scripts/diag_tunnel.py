"""Tunnel/runtime micro-diagnostic: separate dispatch latency, H2D/D2H
bandwidth, and raw MXU throughput so a bench regression can be attributed
to the runtime layer rather than the framework.

Prints one JSON line per probe.  Run alone (claims the TPU).
"""

import json
import time

import jax
import jax.numpy as jnp


def t(fn, iters=20):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    dev = jax.devices()[0]
    print(json.dumps({"probe": "backend", "platform": jax.default_backend(),
                      "device": str(dev)}), flush=True)

    # 1. dispatch latency: trivial jitted scalar round-trip
    one = jnp.float32(1.0)
    f = jax.jit(lambda x: x + 1.0)
    dt = t(lambda: float(f(one)))
    print(json.dumps({"probe": "scalar_roundtrip_ms", "value": round(dt * 1e3, 3)}), flush=True)

    # 2. D2H bandwidth: fetch 64 MB
    big = jnp.zeros((16, 1024, 1024), jnp.float32)
    jax.block_until_ready(big)
    dt = t(lambda: jax.device_get(big), iters=5)
    print(json.dumps({"probe": "d2h_gbps", "value": round(big.nbytes / dt / 1e9, 2)}), flush=True)

    # 3. H2D bandwidth: put 64 MB
    import numpy as np
    host = np.zeros((16, 1024, 1024), np.float32)
    dt = t(lambda: jax.block_until_ready(jax.device_put(host)), iters=5)
    print(json.dumps({"probe": "h2d_gbps", "value": round(host.nbytes / dt / 1e9, 2)}), flush=True)

    # 4. MXU throughput: 4096^3 bf16 matmul chain (8 matmuls to amortize)
    a = jnp.zeros((4096, 4096), jnp.bfloat16)

    @jax.jit
    def mm(x):
        for _ in range(8):
            x = x @ x
        return x

    jax.block_until_ready(mm(a))
    dt = t(lambda: float(mm(a)[0, 0].astype(jnp.float32)), iters=5)
    flops = 8 * 2 * 4096**3
    print(json.dumps({"probe": "mxu_tflops", "value": round(flops / dt / 1e12, 1),
                      "peak_v5e": 197}), flush=True)

    # 5. elementwise HBM stream: 256 MB read+write
    x = jnp.zeros((64, 1024, 1024), jnp.float32)
    g = jax.jit(lambda v: v * 1.0000001 + 1.0)
    jax.block_until_ready(g(x))
    dt = t(lambda: float(g(x)[0, 0, 0]), iters=5)
    print(json.dumps({"probe": "hbm_stream_gbps", "value": round(2 * x.nbytes / dt / 1e9, 1),
                      "peak_v5e": 819}), flush=True)


if __name__ == "__main__":
    main()
