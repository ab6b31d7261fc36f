#!/usr/bin/env python
"""On-chip A/B of the fused kernel's opt-in bf16 MXU inputs.

``mxu_bf16=True`` casts the inputs of the kernel's two large matmuls
(the kcov contraction ``Xbp @ ye`` and the blocked gain application) to
bfloat16 while keeping f32 accumulation (`ops/ensrf_pallas_fused.py`).
MEASURED OUTCOME (recorded in results_v5e_r3.json, "bf16-*" entries):
the posteriors are BIT-IDENTICAL with and without the casts — at JAX's
default matmul precision the MXU already truncates f32 dot inputs to
bf16 and runs ONE pass (confirmed independently by
benchmarks/precision_probe.py; the multi-pass decomposition only runs
under ``Precision.HIGHEST``).  The explicit casts therefore only add
VPU work (headline 0.033 -> 0.048 s) and the flag stays off by default;
this script is kept as the reproduction of that negative result.

Reference anchor for the ops being cast: the per-ob covariance and
rank-1 update of efa_xray/assimilation/ensrf.py:95,141.

Run on the real TPU (background task; each knob is a fresh Mosaic
compile): PYTHONPATH=. python benchmarks/bf16_ab.py --json out.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

# Self-sufficient paths: repo root (for efa_xray_tpu) and benchmarks/
# (for run_benchmarks) WITHOUT touching PYTHONPATH — the axon TPU plugin
# registers through the ambient PYTHONPATH site dir and must stay first.
_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)
import run_benchmarks as rb  # noqa: E402

from efa_xray_tpu.assimilation import ensrf_core as core  # noqa: E402
from efa_xray_tpu.ops.ensrf_pallas_fused import _fused_impl  # noqa: E402


def _workload(nstate, nmems, nobs, seed=4):
    """Hilbert-sorted synthetic workload (geometry on host, state drawn
    on device in sorted order — see bench.py for the layout argument)."""
    from efa_xray_tpu.observation.thinning import _hilbert3d_np

    rng = np.random.default_rng(seed)
    lat = rng.uniform(-88.0, 88.0, nstate)
    lon = rng.uniform(0.0, 360.0, nstate)
    ro = np.argsort(_hilbert3d_np(lat, lon), kind="stable")
    lat, lon = lat[ro], lon[ro]
    ob_rows = rng.integers(0, nstate, nobs)
    ob_lat, ob_lon = lat[ob_rows], lon[ob_rows]
    oo = np.argsort(_hilbert3d_np(ob_lat, ob_lon), kind="stable")
    ob_lat, ob_lon = ob_lat[oo], ob_lon[oo]
    obs = rb._obs_arrays(
        values=280.0 + rng.normal(0, 1.0, nobs),
        errors=np.ones(nobs),
        lats=ob_lat,
        lons=ob_lon,
        radii=np.full(nobs, 2000.0),
        dtype=jnp.float32,
    )
    return lat, lon, obs


def accuracy_ab(nstate=1_048_576, nmems=80, nobs=2048):
    """One full blocked update with each knob; report the bf16 posterior's
    deviation from the f32 posterior, scaled by the ensemble spread (the
    physically meaningful yardstick) and by the analysis increment."""
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

    def run(mxu_bf16):
        @jax.jit
        def step(bm, bp, tm, tp, blat, blon, obs):
            tail = core.tail_scan_blocked(tm, tp, obs, localize=True,
                                          fast_geometry=True, panel=512,
                                          pallas_apply=True)
            return _fused_impl(bm, bp, blat, blon, tail, obs,
                               localize=True, block_size=128, tile=8192,
                               mxu_bf16=mxu_bf16)

        bm2, bp2 = step(bm, bp, tm, tp, blat, blon, obs)
        return np.asarray(bm2), np.asarray(bp2)

    m32, p32 = run(False)
    m16, p16 = run(True)
    spread = float(np.sqrt(np.mean(p32**2)))
    incr = float(np.sqrt(np.mean((m32 - np.asarray(bm)) ** 2)))
    dm = float(np.sqrt(np.mean((m16 - m32) ** 2)))
    dp = float(np.sqrt(np.mean((p16 - p32) ** 2)))
    return {
        "config": "bf16-accuracy",
        "nstate": nstate, "nmems": nmems, "nobs": nobs,
        "posterior_spread_rms": spread,
        "mean_increment_rms": incr,
        "mean_rms_delta_bf16_vs_f32": dm,
        "pert_rms_delta_bf16_vs_f32": dp,
        "mean_delta_over_increment": dm / max(incr, 1e-30),
        "pert_delta_over_spread": dp / max(spread, 1e-30),
        "backend": jax.default_backend(),
    }


def timing_ab(nstate, nmems, nobs, label, iters=3):
    lat, lon, obs = _workload(nstate, nmems, nobs)
    rng = np.random.default_rng(1)
    prior = (280.0 + 5.0 * rng.standard_normal((nstate, nmems))).astype(
        np.float32)
    out = {"config": f"bf16-ab-{label}", "nstate": nstate, "nmems": nmems,
           "nobs": nobs, "tile": 8192, "block_size": 128,
           "backend": jax.default_backend()}
    for knob in (False, True):
        key = "seconds_bf16" if knob else "seconds_f32"
        try:
            out[key] = rb._timed_update(
                prior, lat, lon, obs, block_size=128, iters=iters,
                kernel="v4", tile=8192, donate=True, mxu_bf16=knob)
        except Exception as e:  # record, keep going
            out[key] = None
            out[key + "_error"] = repr(e)[:300]
        print(json.dumps({key: out[key], "label": label}), flush=True)
    if out.get("seconds_f32") and out.get("seconds_bf16"):
        out["speedup"] = out["seconds_f32"] / out["seconds_bf16"]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--skip-pod", action="store_true")
    args = ap.parse_args()

    results = []
    results.append(accuracy_ab())
    print(json.dumps(results[-1]), flush=True)
    results.append(timing_ab(1_048_576, 80, 2048, "headline"))
    print(json.dumps(results[-1]), flush=True)
    if not args.skip_pod:
        results.append(timing_ab(10_000_000, 80, 10_000, "pod", iters=2))
        print(json.dumps(results[-1]), flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
