"""Quantify the conv channel-padding lever (VERDICT r3 "what's weak" #3).

SD1.5's UNet conv widths 320/640 are not 128-lane multiples (320 % 128 = 64),
so the MXU K/N tiles under the ~18%-of-step conv band are partially padded.
Hypothesis to quantify or refute: a conv at C zero-padded to the next
128-multiple (320->384, 640->768) runs no slower than the native-C conv, in
which case padded compute would recover the tile-padding waste end-to-end.

Method: scan-amortized timing (one dispatch, many convs, hard readback —
the diag_compute.py pattern) of the dominant ResnetBlock2D 3x3 C->C convs at
their production spatial sizes, bf16 NHWC, microbatch 4.  Contraction-stable
fill (kernel = 1/(9*C)) keeps the chain at magnitude 1 for any rep count.

For each (H, C_native, C_padded) pair prints native + padded ms and the
throughput RATIO of useful work: useful_flops(native) / t(padded) vs
/ t(native).  ratio > 1.05 means the lever is real (>5% on the conv band);
ratio ~<= 1 refutes it (XLA/Mosaic already handles the odd tile well, and the
padded variant pays its extra 44% MACs).
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, iters=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def conv_chain_ms(batch, h, c, reps=512):
    x = jnp.ones((batch, h, h, c), jnp.bfloat16)
    k = jnp.full((3, 3, c, c), 1.0 / (9.0 * c), jnp.bfloat16)

    @jax.jit
    def chain(v):
        def body(carry, _):
            out = lax.conv_general_dilated(
                carry, k, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            )
            return out, ()
        out, _ = lax.scan(body, v, None, length=reps)
        return out

    dt = timed(lambda: float(chain(x)[0, 0, 0, 0].astype(jnp.float32)))
    return dt * 1e3 / reps  # ms per conv


def main():
    batch = 4  # production microbatch (BENCH_NOTES mb4 recipe)
    cases = [
        # (spatial, native C, padded C): level-0 and level-1 resnet convs
        (64, 320, 384),
        (32, 640, 768),
        (32, 320, 384),   # level-1 skip/in convs still at 320
        (16, 1280, 1280),  # control: already 10x128-aligned
    ]
    for h, c_nat, c_pad in cases:
        ms_nat = conv_chain_ms(batch, h, c_nat)
        ms_pad = ms_nat if c_pad == c_nat else conv_chain_ms(batch, h, c_pad)
        useful_flops = 2.0 * batch * h * h * 9 * c_nat * c_nat
        tflops_nat = useful_flops / (ms_nat * 1e-3) / 1e12
        tflops_pad_useful = useful_flops / (ms_pad * 1e-3) / 1e12
        print(json.dumps({
            "probe": "conv_pad",
            "h": h, "c_native": c_nat, "c_padded": c_pad,
            "ms_native": round(ms_nat, 4), "ms_padded": round(ms_pad, 4),
            "useful_tflops_native": round(tflops_nat, 1),
            "useful_tflops_via_pad": round(tflops_pad_useful, 1),
            "pad_speedup": round(ms_nat / ms_pad, 3),
            "mxu_eff_native": round(tflops_nat / 197.0, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
