"""Compiled-on-TPU parity for EVERY Pallas kernel (Mosaic-level gate).

The CI suite verifies the kernels in interpret mode (semantics); this script
closes the remaining gap — Mosaic compilation itself — by running each
kernel COMPILED on the visible TPU against its registered 'ref' impl,
forward and backward, and printing one JSON verdict line.  Run before each
bench round (CLAUDE.md kernel convention).

  python scripts/tpu_compiled_parity.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def max_err(a, b):
    return float(jnp.max(jnp.abs(jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32))))


def check(name, got, want, tol, report):
    # Scale-aware: large reductions (e.g. a bias grad summing thousands of
    # elements) legitimately differ by reduction order; compare against the
    # magnitude of the reference.
    err = max_err(got, want)
    scale = max(1.0, float(jnp.max(jnp.abs(jnp.asarray(want, jnp.float32)))))
    report[name] = {"max_err": round(err, 6), "tol": tol,
                    "rel_to_scale": round(err / scale, 9),
                    "ok": err <= tol * scale}
    return report[name]["ok"]


def main():
    from sid_lsg_tpu import ops
    from sid_lsg_tpu.runtime.compile_cache import enable

    enable()
    report = {"backend": jax.default_backend()}
    ok = True
    ks = jax.random.split(jax.random.PRNGKey(0), 8)

    # ---- attention fwd + both backward modes (bf16, SD shapes + padding)
    q = jax.random.normal(ks[0], (1, 4, 1000, 40), jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, 4, 700, 40), jnp.bfloat16)
    v = jax.random.normal(ks[2], (1, 4, 700, 40), jnp.bfloat16)
    fwd = lambda impl: jax.jit(lambda q, k, v: ops.attention(q, k, v, impl=impl))
    ok &= check("attention_fwd", fwd("pallas")(q, k, v), fwd("ref")(q, k, v),
                5e-3, report)

    def grads(impl):
        loss = lambda q, k, v: jnp.sum(jnp.square(
            ops.attention(q, k, v, impl=impl).astype(jnp.float32)))
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)

    want_g = grads("ref")
    for mode in ("fused", "twopass"):
        os.environ["SIDLSG_FLASH_BWD"] = mode
        got_g = grads("pallas")
        for g1, g2, nm in zip(got_g, want_g, "qkv"):
            ok &= check(f"attention_bwd_{mode}_d{nm}", g1, g2, 5e-2, report)
    os.environ.pop("SIDLSG_FLASH_BWD", None)

    # ---- bias_act fwd + grad (f32)
    x = jax.random.normal(ks[3], (4, 64, 33, 48))
    b = jax.random.normal(ks[4], (48,))
    ba = lambda impl: jax.jit(lambda x, b: ops.bias_act(
        x, b, dim=3, act="lrelu", gain=1.4, clamp=8.0, impl=impl))
    ok &= check("bias_act_fwd", ba("pallas")(x, b), ba("ref")(x, b), 1e-5, report)
    gba = lambda impl: jax.jit(jax.grad(lambda x, b: jnp.sum(jnp.square(ops.bias_act(
        x, b, dim=3, act="lrelu", gain=1.4, clamp=8.0, impl=impl))), argnums=(0, 1)))
    for g1, g2, nm in zip(gba("pallas")(x, b), gba("ref")(x, b), ("x", "b")):
        ok &= check(f"bias_act_bwd_d{nm}", g1, g2, 1e-3, report)

    # ---- group_norm (+silu) fwd + grad (f32, SD channel count)
    xg = jax.random.normal(ks[5], (2, 32, 32, 320))
    gamma = jax.random.normal(ks[6], (320,)) + 1.0
    beta = jax.random.normal(ks[7], (320,))
    gn = lambda impl: jax.jit(lambda x, g_, b_: ops.group_norm(
        x, g_, b_, num_groups=32, silu=True, impl=impl))
    ok &= check("group_norm_fwd", gn("pallas")(xg, gamma, beta),
                gn("ref")(xg, gamma, beta), 1e-4, report)
    ggn = lambda impl: jax.jit(jax.grad(lambda x, g_, b_: jnp.sum(jnp.square(
        ops.group_norm(x, g_, b_, num_groups=32, silu=True, impl=impl))),
        argnums=(0, 1, 2)))
    for g1, g2, nm in zip(ggn("pallas")(xg, gamma, beta),
                          ggn("ref")(xg, gamma, beta), ("x", "gamma", "beta")):
        ok &= check(f"group_norm_bwd_d{nm}", g1, g2, 5e-3, report)

    report["ok"] = bool(ok)
    print(json.dumps(report))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
