"""Flash-attention kernel bench + compiled-on-TPU parity check.

Times fwd and fwd+bwd for the XLA reference and the Pallas kernels (both
backward modes) at a given shape, and checks compiled numerics against the
reference (the interpret-mode suite covers semantics; this covers Mosaic).

  python scripts/bench_attention.py --b 2 --h 8 --s 4096 --d 40
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--h", type=int, default=8)
    ap.add_argument("--s", type=int, default=4096)
    ap.add_argument("--d", type=int, default=40)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip-ref-bwd", action="store_true",
                    help="ref bwd materialises S x S; may OOM at big S")
    ap.add_argument("--sweep", default=None,
                    help="semicolon list of q,k block pairs to time for the "
                    "fused fwd+bwd, e.g. '512,1024;512,512;256,1024'")
    args = ap.parse_args()

    from sid_lsg_tpu import ops
    from sid_lsg_tpu.runtime.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    dtype = jnp.dtype(args.dtype)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (args.b, args.h, args.s, args.d), dtype)
    k = jax.random.normal(ks[1], (args.b, args.h, args.s, args.d), dtype)
    v = jax.random.normal(ks[2], (args.b, args.h, args.s, args.d), dtype)

    def fwd(impl):
        return jax.jit(lambda q, k, v: ops.attention(q, k, v, impl=impl))

    def fwdbwd(impl):
        def loss(q, k, v):
            return jnp.sum(jnp.square(ops.attention(q, k, v, impl=impl)))

        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    result = {"shape": [args.b, args.h, args.s, args.d], "dtype": args.dtype,
              "backend": jax.default_backend()}

    # Compiled numerics: pallas (both bwd modes) vs ref on a reduced shape
    # that the ref backward can always hold.
    sq_chk = min(args.s, 1024)
    qc, kc, vc = (x[:, :2, :sq_chk] for x in (q, k, v))
    want_f = np.asarray(fwd("ref")(qc, kc, vc), np.float32)
    got_f = np.asarray(fwd("pallas")(qc, kc, vc), np.float32)
    result["fwd_max_err"] = float(np.abs(got_f - want_f).max())
    want_g = fwdbwd("ref")(qc, kc, vc)
    for mode in ("fused", "twopass"):
        os.environ["SIDLSG_FLASH_BWD"] = mode
        got_g = fwdbwd("pallas")(qc, kc, vc)
        errs = [float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
                for a, b in zip(got_g, want_g)]
        result[f"bwd_{mode}_max_err_dqkv"] = [round(e, 6) for e in errs]

    result["fwd_ms_ref"] = round(timeit(fwd("ref"), q, k, v, iters=args.iters), 3)
    result["fwd_ms_pallas"] = round(timeit(fwd("pallas"), q, k, v, iters=args.iters), 3)
    if not args.skip_ref_bwd:
        try:
            result["fwdbwd_ms_ref"] = round(
                timeit(fwdbwd("ref"), q, k, v, iters=args.iters), 3)
        except Exception as e:  # ref bwd is O(S^2); OOM is expected at scale
            result["fwdbwd_ms_ref"] = f"failed: {type(e).__name__}"
    for mode in ("twopass", "fused"):
        os.environ["SIDLSG_FLASH_BWD"] = mode
        result[f"fwdbwd_ms_pallas_{mode}"] = round(
            timeit(fwdbwd("pallas"), q, k, v, iters=args.iters), 3)
    if args.sweep:
        os.environ["SIDLSG_FLASH_BWD"] = "fused"
        sweep = {}
        for pair in args.sweep.split(";"):
            os.environ["SIDLSG_FLASH_BLOCKS"] = pair
            try:
                sweep[pair] = round(timeit(fwdbwd("pallas"), q, k, v,
                                           iters=args.iters), 3)
            except Exception as e:
                sweep[pair] = f"failed: {type(e).__name__}"
        os.environ.pop("SIDLSG_FLASH_BLOCKS", None)
        result["sweep_fwdbwd_ms"] = sweep
    print(json.dumps(result))


if __name__ == "__main__":
    main()
