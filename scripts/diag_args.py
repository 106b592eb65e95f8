"""Per-call overhead vs number of argument buffers.

If the tunneled runtime charges per-buffer marshalling per execution, a
call with N tiny args should scale ~linearly in N — which would explain a
multi-second dispatch for the distillation step (thousands of param
leaves) while a 1-arg scalar round-trip stays at tens of ms.
"""

import json
import time

import jax
import jax.numpy as jnp


def probe(n_args, iters=5):
    args = [jnp.float32(i) for i in range(n_args)]
    f = jax.jit(lambda *xs: sum(xs))
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(*args))
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"probe": f"call_{n_args}_args_ms", "value": round(dt * 1e3, 1),
                      "per_arg_us": round(dt / n_args * 1e6, 1)}), flush=True)


def main():
    for n in (1, 10, 100, 1000):
        probe(n)

    # Same total bytes, 1 buffer vs 1000 buffers (4 KB each)
    one = jnp.zeros((1000, 1024), jnp.float32)
    f1 = jax.jit(lambda x: x.sum())
    float(f1(one))
    t0 = time.perf_counter()
    for _ in range(5):
        float(f1(one))
    print(json.dumps({"probe": "call_1_buffer_4MB_ms",
                      "value": round((time.perf_counter() - t0) / 5 * 1e3, 1)}), flush=True)

    many = [jnp.zeros((1024,), jnp.float32) for _ in range(1000)]
    fm = jax.jit(lambda xs: sum(x.sum() for x in xs))
    float(fm(many))
    t0 = time.perf_counter()
    for _ in range(5):
        float(fm(many))
    print(json.dumps({"probe": "call_1000_buffers_4MB_ms",
                      "value": round((time.perf_counter() - t0) / 5 * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
