#!/usr/bin/env python
"""Cull-granularity sweep of the fused v4 body at the pod-full workload
(10k obs x 1e7 rows x 80 members) — the "measured 2x candidate" of
docs/design.md §8: smaller row tiles tighten the cull bound's tile caps
(fewer alive panels) at the price of more kernel iterations; smaller obs
blocks refine skip granularity but shrink the MXU matmuls.

Run: PYTHONPATH=. python benchmarks/pod_tile_sweep.py [--json out]
(each combo is a fresh Mosaic compile — minutes each on the axon tunnel).
"""

from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from breakdown import _chain_time, _make_workload
from efa_xray_tpu.assimilation import ensrf_core as core


def sweep_point(bm, bp, blat, blon, obs, tail_sol, tile, block_size,
                iters=2, panel=8):
    from efa_xray_tpu.ops.ensrf_pallas_fused import _fused_impl, cull_masks
    from efa_xray_tpu.observation.localization import latlon_to_unit

    out = {"tile": tile, "block_size": block_size, "panel": panel}
    try:
        step = jax.jit(
            lambda a, b: _fused_impl(a, b, blat, blon, tail_sol, obs,
                                     localize=True, block_size=block_size,
                                     tile=tile, panel=panel),
            donate_argnums=(0, 1),
        )
        t, carry = _chain_time(
            step, (bm, bp),
            lambda c: jnp.sum(c[0]) + jnp.sum(c[1][:, 0]), iters=iters)
        out["body_seconds"] = t
        # hand the (donated-through) buffers back for the next point
        bm, bp = carry[0], carry[1]
    except Exception as e:
        out["error"] = repr(e)[:200]
        return out, bm, bp

    nstate = blat.shape[0]
    nobs = obs.values.shape[0]
    eff_tile = max(8, min(-(-tile // 8) * 8, -(-nstate // 8) * 8))
    nblocks = max(1, -(-nobs // block_size))
    _, pmask = cull_masks(
        latlon_to_unit(blat, blon), latlon_to_unit(obs.lats, obs.lons),
        obs.radii, obs.assim, eff_tile, nblocks, block_size, panel=panel)
    out["alive_panel_fraction"] = float(jnp.mean(pmask))
    return out, bm, bp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nstate", type=int, default=10_000_000)
    ap.add_argument("--nmems", type=int, default=80)
    ap.add_argument("--nobs", type=int, default=10_000)
    ap.add_argument("--tiles", type=int, nargs="*",
                    default=[4096, 8192, 16384])
    ap.add_argument("--blocks", type=int, nargs="*", default=[128])
    ap.add_argument("--panels", type=int, nargs="*", default=[8])
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    bm, bp, tm, tp, blat, blon, obs = _make_workload(
        args.nstate, args.nmems, args.nobs)
    tail_sol = jax.block_until_ready(core.tail_scan_blocked(
        tm, tp, obs, localize=True, fast_geometry=True, panel=512,
        pallas_apply=True))

    results = []
    for tile in args.tiles:
        for block in args.blocks:
            for panel in args.panels:
                r, bm, bp = sweep_point(bm, bp, blat, blon, obs, tail_sol,
                                        tile, block, panel=panel)
                r["backend"] = jax.default_backend()
                print(json.dumps(r), flush=True)
                results.append(r)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
