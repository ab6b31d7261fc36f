#!/usr/bin/env python
"""What does an f32 matmul actually compute on the MXU? (on-chip probe)

Three variants of the same [N, K] @ [K, N] f32 product inside a Mosaic
kernel — default precision, explicitly bf16-cast inputs, and
``lax.Precision.HIGHEST`` — each compared against a float64 NumPy
oracle.  Motivated by the bf16 A/B result (benchmarks/bf16_ab.py): the
fused kernel's posteriors are BIT-IDENTICAL with and without explicit
bf16 input casts, implying default f32 dots already run as single-pass
bf16 on v5e.  This probe pins that down and measures what HIGHEST
(multi-pass f32 emulation) buys in accuracy and costs in time.

Run: python benchmarks/precision_probe.py
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(mode):
    def kernel(a_ref, b_ref, o_ref):
        a, b = a_ref[:], b_ref[:]
        if mode == "bf16":
            a, b = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
        prec = jax.lax.Precision.HIGHEST if mode == "highest" else None
        o_ref[:] = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("mode",))
def mm(a, b, mode):
    return pl.pallas_call(
        _make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((a.shape[0], b.shape[1]),
                                       jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(a, b)


def main():
    rng = np.random.default_rng(0)
    n, k = 512, 512
    a64 = rng.standard_normal((n, k))
    b64 = rng.standard_normal((k, n))
    a = jnp.asarray(a64, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)
    oracle = np.asarray(a64, np.float32).astype(np.float64) @ np.asarray(
        b64, np.float32).astype(np.float64)
    scale = float(np.sqrt(np.mean(oracle**2)))

    out = {"n": n, "k": k, "backend": jax.default_backend(),
           "device": str(jax.devices()[0])}
    res = {}
    for mode in ("default", "bf16", "highest"):
        try:
            r = np.asarray(mm(a, b, mode), np.float64)
            res[mode] = r
            out[f"{mode}_rms_err_over_scale"] = float(
                np.sqrt(np.mean((r - oracle) ** 2)) / scale)
        except Exception as e:
            out[f"{mode}_error"] = repr(e)[:300]
    if "default" in res and "bf16" in res:
        out["default_equals_bf16_bitwise"] = bool(
            np.array_equal(res["default"], res["bf16"]))
    if "default" in res and "highest" in res:
        out["highest_equals_default_bitwise"] = bool(
            np.array_equal(res["default"], res["highest"]))
    print(json.dumps(out), flush=True)  # accuracy verdict survives timing

    # Crude relative timing (single-block kernel: HIGHEST's multi-pass
    # decomposition holds ~3x the operand bytes in VMEM, so stay small;
    # the production-kernel cost is measured by benchmarks/precision_ab.py).
    if "highest" in res:
        nb, kb = 1024, 1024
        ab = jnp.asarray(rng.standard_normal((nb, kb)), jnp.float32)
        bb = jnp.asarray(rng.standard_normal((kb, nb)), jnp.float32)

        @jax.jit
        def digest(x):
            return jnp.sum(x)

        for mode in ("default", "highest"):
            r = mm(ab, bb, mode)
            _ = float(digest(r))
            t0 = time.perf_counter()
            for _ in range(8):
                r = mm(ab, bb, mode)
            _ = float(digest(r))
            out[f"{mode}_{nb}_seconds"] = (time.perf_counter() - t0) / 8

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
