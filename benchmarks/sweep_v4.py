#!/usr/bin/env python
"""Tuning sweep for the fused v4 kernel: (block_size, tile) grid on the
headline workload (1M rows x 80 members, 2048 localized obs) plus a
localize=False probe that isolates the in-kernel weight-computation cost.

Run on the real TPU: PYTHONPATH=. python benchmarks/sweep_v4.py
(each combination is a fresh Mosaic compile — minutes on the axon tunnel).
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from efa_xray_tpu.assimilation import ensrf_core as core
from efa_xray_tpu.ops.ensrf_pallas_fused import _fused_impl


def timed(nstate, nmems, nobs, block_size, tile, localize=True, iters=3,
          seed=0):
    rng = np.random.default_rng(seed)
    prior = rng.normal(280, 5, (nstate, nmems)).astype(np.float32)
    lat = rng.uniform(-88, 88, nstate).astype(np.float32)
    lon = rng.uniform(0, 360, nstate).astype(np.float32)
    rows = rng.integers(0, nstate, nobs)
    obs = core.ObsArrays(
        values=jnp.asarray(prior[rows].mean(1) + 1, jnp.float32),
        errors=jnp.ones(nobs, jnp.float32),
        lats=jnp.asarray(lat[rows]),
        lons=jnp.asarray(lon[rows]),
        radii=jnp.full(nobs, 2000.0, jnp.float32),
        assim=jnp.ones(nobs, bool),
    )
    pj = jnp.asarray(prior)
    bm = jnp.mean(pj, axis=1)
    bp = pj - bm[:, None]
    ye = pj[rows]
    tm = jnp.mean(ye, axis=1)
    tp = ye - tm[:, None]
    blat, blon = jnp.asarray(lat), jnp.asarray(lon)

    @jax.jit
    def step(bm, bp, tm, tp, blat, blon, obs):
        tail = core.tail_scan(tm, tp, obs, localize=localize,
                              fast_geometry=True)
        bm2, bp2 = _fused_impl(bm, bp, blat, blon, tail, obs,
                               localize=localize, block_size=block_size,
                               tile=tile)
        return bm2, bp2, tail.tail_mean, tail.tail_perts

    @jax.jit
    def digest(bm, bp):
        return jnp.sum(bm) + jnp.sum(bp[:, 0])

    try:
        carry = step(bm, bp, tm, tp, blat, blon, obs)
        _ = float(digest(carry[0], carry[1]))
    except Exception as e:
        return {"error": str(e)[:200]}
    t0 = time.perf_counter()
    _ = float(digest(carry[0], carry[1]))
    sync = time.perf_counter() - t0
    c = (bm, bp, tm, tp)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = step(*c, blat, blon, obs)
    _ = float(digest(c[0], c[1]))
    return {"seconds": max((time.perf_counter() - t0 - sync) / iters, 1e-9)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nstate", type=int, default=1 << 20)
    ap.add_argument("--nmems", type=int, default=80)
    ap.add_argument("--nobs", type=int, default=2048)
    ap.add_argument("--blocks", type=int, nargs="*", default=[128, 256])
    ap.add_argument("--tiles", type=int, nargs="*", default=[4096, 8192, 16384])
    ap.add_argument("--probe-weights", action="store_true")
    args = ap.parse_args()

    for b in args.blocks:
        for t in args.tiles:
            r = timed(args.nstate, args.nmems, args.nobs, b, t)
            r.update(block_size=b, tile=t, localize=True)
            print(json.dumps(r), flush=True)
    if args.probe_weights:
        r = timed(args.nstate, args.nmems, args.nobs, 128, 8192,
                  localize=False)
        r.update(block_size=128, tile=8192, localize=False)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()

# --- round 3: cull-granularity sweep on the pod-full workload -------------
# Smaller row tiles tighten the cull bound's tile caps (more skipped
# panels) at the price of more kernel iterations; smaller obs blocks
# refine skip granularity but shrink the MXU matmuls.  That sweep lives in
# its own tool:
#   python benchmarks/pod_tile_sweep.py
