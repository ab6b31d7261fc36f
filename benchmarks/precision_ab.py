#!/usr/bin/env python
"""Production-path A/B of ``matmul_precision``: default (single-pass bf16
MXU ingestion of f32 dot inputs — measured semantics, see
benchmarks/precision_probe.py) vs ``"highest"`` (multi-pass true-f32).

Measures the headline blocked update (Pallas tail + fused v4 body) under
``jax.default_matmul_precision`` — exactly how ``FilterConfig.
matmul_precision`` applies it — and the posterior delta between the two,
scaled by ensemble spread and by the analysis increment.

Run on the real TPU: python benchmarks/precision_ab.py [--json out]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import run_benchmarks as rb  # noqa: E402
from bf16_ab import _workload  # noqa: E402

from efa_xray_tpu.assimilation import ensrf_core as core  # noqa: E402
from efa_xray_tpu.ops.ensrf_pallas_fused import _fused_impl  # noqa: E402


def _ctx(mode):
    import contextlib

    return (contextlib.nullcontext() if mode is None
            else jax.default_matmul_precision(mode))


def accuracy_ab(nstate=1_048_576, nmems=80, nobs=2048):
    lat, lon, obs = _workload(nstate, nmems, nobs)
    bm = 280.0 + 0.5 * jax.random.normal(jax.random.PRNGKey(3), (nstate,),
                                         dtype=jnp.float32)
    bp = 5.0 * jax.random.normal(jax.random.PRNGKey(4), (nstate, nmems),
                                 dtype=jnp.float32)
    tp0 = 5.0 * jax.random.normal(jax.random.PRNGKey(5), (nobs, nmems),
                                  dtype=jnp.float32)
    tm = jnp.mean(tp0, axis=1) + 280.0
    tp = tp0 - jnp.mean(tp0, axis=1)[:, None]
    blat = jnp.asarray(lat, jnp.float32)
    blon = jnp.asarray(lon, jnp.float32)

    def run(mode):
        @jax.jit
        def step(bm, bp, tm, tp, blat, blon, obs):
            tail = core.tail_scan_blocked(tm, tp, obs, localize=True,
                                          fast_geometry=True, panel=512,
                                          pallas_apply=True)
            return _fused_impl(bm, bp, blat, blon, tail, obs,
                               localize=True, block_size=128, tile=8192)

        with _ctx(mode):
            bm2, bp2 = step(bm, bp, tm, tp, blat, blon, obs)
        return np.asarray(bm2), np.asarray(bp2)

    m_d, p_d = run(None)
    m_h, p_h = run("highest")
    spread = float(np.sqrt(np.mean(p_h**2)))
    incr = float(np.sqrt(np.mean((m_h - np.asarray(bm)) ** 2)))
    dm = float(np.sqrt(np.mean((m_d - m_h) ** 2)))
    dp = float(np.sqrt(np.mean((p_d - p_h) ** 2)))
    return {
        "config": "precision-accuracy",
        "nstate": nstate, "nmems": nmems, "nobs": nobs,
        "posterior_spread_rms": spread,
        "mean_increment_rms": incr,
        "mean_rms_delta_default_vs_highest": dm,
        "pert_rms_delta_default_vs_highest": dp,
        "mean_delta_over_increment": dm / max(incr, 1e-30),
        "pert_delta_over_spread": dp / max(spread, 1e-30),
        "backend": jax.default_backend(),
    }


def timing_ab(nstate, nmems, nobs, label, iters=3):
    lat, lon, obs = _workload(nstate, nmems, nobs)
    rng = np.random.default_rng(1)
    prior = (280.0 + 5.0 * rng.standard_normal((nstate, nmems))).astype(
        np.float32)
    out = {"config": f"precision-ab-{label}", "nstate": nstate,
           "nmems": nmems, "nobs": nobs, "tile": 8192, "block_size": 128,
           "backend": jax.default_backend()}
    for mode, key in ((None, "seconds_default"), ("highest",
                                                  "seconds_highest")):
        try:
            with _ctx(mode):
                out[key] = rb._timed_update(
                    prior, lat, lon, obs, block_size=128, iters=iters,
                    kernel="v4", tile=8192, donate=True)
        except Exception as e:
            out[key] = None
            out[key + "_error"] = repr(e)[:300]
        print(json.dumps({key: out[key], "label": label}), flush=True)
    if out.get("seconds_default") and out.get("seconds_highest"):
        out["highest_cost_factor"] = (
            out["seconds_highest"] / out["seconds_default"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    results = [accuracy_ab()]
    print(json.dumps(results[-1]), flush=True)
    results.append(timing_ab(1_048_576, 80, 2048, "headline"))
    print(json.dumps(results[-1]), flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
