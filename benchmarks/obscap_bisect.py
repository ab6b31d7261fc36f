#!/usr/bin/env python
"""Bisect the EnSRF 200k-obs TPU worker crash (config 12).

At nobs = 200k the fused EnSRF path kills the TPU worker process itself
(UNAVAILABLE, "kernel fault") in a FRESH process, while both LETKF paths
run fine — so the fault lives in one of the EnSRF Mosaic kernels or in
the XLA tail at that shape.  This probe runs ONE (mode, nobs) combination
per invocation so a crash is attributable:

  xla    — XLA tail + XLA blocked body (no Mosaic anywhere)
  tail   — Pallas tail (in-kernel panel solve + fused apply), XLA body
  body   — XLA tail, fused v4 Pallas body
  full   — the production path (Pallas tail + Pallas body)

Usage: python benchmarks/obscap_bisect.py --mode full --nobs 200000
Exit code 0 + one JSON line on success; a worker crash kills the process
(the caller records the exit code).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True,
                    choices=["xla", "tail", "body", "full"])
    ap.add_argument("--nobs", type=int, required=True)
    ap.add_argument("--donate", action="store_true",
                    help="donate the state buffers into the jitted step "
                         "(the config-12 point that crashed the worker "
                         "donated; the non-donating probe did not)")
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force host CPU (smoke tests; Pallas modes run "
                         "in interpret mode implicitly unavailable — "
                         "use --mode xla)")
    ap.add_argument("--nstate", type=int, default=None,
                    help="override state size (smoke tests)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from efa_xray_tpu.assimilation import ensrf_core as core
    from efa_xray_tpu.observation.thinning import _hilbert3d_np

    rng = np.random.default_rng(12)
    ny, nx, nmems = 361, 720, 40
    ngrid = args.nstate or (ny * nx)
    lat1d = np.linspace(-90, 90, ny)
    lon1d = np.arange(0, 360, 0.5)
    lon, lat = np.meshgrid(lon1d, lat1d)
    glat, glon = lat.ravel()[:ngrid], lon.ravel()[:ngrid]
    ro = np.argsort(_hilbert3d_np(glat, glon), kind="stable")
    glat, glon = glat[ro], glon[ro]
    nobs = args.nobs
    rows = rng.integers(0, ngrid, nobs)
    olat, olon = glat[rows], glon[rows]
    oo = np.argsort(_hilbert3d_np(olat, olon), kind="stable")
    olat, olon = olat[oo], olon[oo]

    dtype = jnp.float32
    prior = rng.normal(280, 5, (ngrid, nmems)).astype(np.float32)
    pj = jnp.asarray(prior, dtype=dtype)
    bm = jnp.mean(pj, axis=1)
    bp = pj - bm[:, None]
    ye0 = pj[jnp.asarray(rng.integers(0, ngrid, nobs))]
    tm = jnp.mean(ye0, axis=1)
    tp = ye0 - tm[:, None]
    obs = core.ObsArrays(
        values=jnp.asarray(280.0 + rng.normal(0, 1, nobs), dtype=dtype),
        errors=jnp.ones(nobs, dtype=dtype),
        lats=jnp.asarray(olat, dtype=dtype),
        lons=jnp.asarray(olon, dtype=dtype),
        radii=jnp.asarray(np.full(nobs, 2000.0), dtype=dtype),
        assim=jnp.ones(nobs, dtype=bool),
    )
    blat = jnp.asarray(glat, dtype=dtype)
    blon = jnp.asarray(glon, dtype=dtype)

    tail_pallas = args.mode in ("tail", "full")
    body_pallas = args.mode in ("body", "full")

    def step(bm_, bp_):
        tail = core.tail_scan_blocked(
            tm, tp, obs, localize=True,
            fast_geometry=True, panel=512,
            pallas_apply=tail_pallas,
        )
        if body_pallas:
            from efa_xray_tpu.ops.ensrf_pallas_fused import _fused_impl

            bm2, bp2 = _fused_impl(
                bm_, bp_, blat, blon, tail, obs,
                localize=True, block_size=128, tile=8192,
            )
        else:
            bm2, bp2 = core.ensrf_blocked_body(
                bm_, bp_, blat, blon, tail, obs,
                localize=True, block_size=128, fast_geometry=True,
            )
        return bm2, bp2

    if args.donate:
        step = jax.jit(step, donate_argnums=(0, 1))

    digest = jax.jit(lambda a, b: jnp.sum(a) + jnp.sum(b[:, 0]))
    t0 = time.perf_counter()
    am, ap_ = step(bm, bp)
    _ = float(digest(am, ap_))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(digest(am, ap_))
    sync = time.perf_counter() - t0
    # Chain the carry (donation invalidates the inputs of the prior call).
    t0 = time.perf_counter()
    am, ap_ = step(am, ap_)
    _ = float(digest(am, ap_))
    dt = time.perf_counter() - t0 - sync
    result = {"config": "obscap-bisect", "mode": args.mode, "nobs": nobs,
              "donate": bool(args.donate),
              "seconds": max(dt, 1e-9),
              "first_call_seconds": t_compile,
              "finite": bool(np.isfinite(np.asarray(am)).all()),
              "backend": jax.default_backend()}
    print(json.dumps(result), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
