#!/usr/bin/env python
"""On-chip validation of the VMEM-capped grid-kernel tiles.

Before the workload-aware auto tile (``efa_xray_tpu/ops/tiling.py``),
the grid-mode kernels defaulted to whole-grid tiles, which cannot
compile on grids where the ``[block_size, tile]`` weight panel alone
exceeds the kernels' 100 MB VMEM limit (a 0.5-deg 260k-point grid needs
133 MB).  This script runs both grid kernels on exactly such a grid with
the production auto tile and reports compile+run success and timing:

- v4-grid (fast chordal geometry, per-grid-point weights streamed in),
- grid-mode v3 (exact haversine weights — the path exact-geometry
  gridded production runs take).

Usage (real TPU):  python benchmarks/validate_grid_tiles.py [--json OUT]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

from run_benchmarks import _obs_arrays, _timed_update  # noqa: E402
from efa_xray_tpu.ops.tiling import auto_grid_tile  # noqa: E402


def build(nmems=40, nobs=2000, vt=4, seed=2):
    """0.5-deg global grid (361 x 720 = 259,920 points) with ``vt``
    variable/time groups — large enough that whole-grid tiles cannot
    compile."""
    rng = np.random.default_rng(seed)
    ny, nx = 361, 720
    ngrid = ny * nx
    lat1d = np.linspace(-90, 90, ny)
    lon1d = np.arange(0, 360, 0.5)
    lon, lat = np.meshgrid(lon1d, lat1d)
    row_lat = np.tile(lat.ravel(), vt)
    row_lon = np.tile(lon.ravel(), vt)
    nstate = vt * ngrid
    prior = rng.normal(0, 5, (nstate, nmems)).astype(np.float32)
    rows = rng.integers(0, nstate, nobs)
    obs = _obs_arrays(
        prior[rows].mean(1) + rng.normal(0, 1, nobs), np.ones(nobs),
        row_lat[rows], row_lon[rows], np.full(nobs, 2000.0), jnp.float32,
    )
    return prior, row_lat, row_lon, obs, ngrid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    prior, row_lat, row_lon, obs, ngrid = build()
    nmems = prior.shape[1]
    tile = auto_grid_tile(block_size=128, nmems=nmems)
    print(f"backend={jax.default_backend()} ngrid={ngrid} "
          f"auto_grid_tile={tile} (whole-grid would be {ngrid})",
          flush=True)

    out = {"config": "grid-tile-validation", "ngrid": ngrid,
           "nstate": prior.shape[0], "nmems": nmems,
           "nobs": int(np.asarray(obs.values).shape[0]), "tile": tile}
    for kernel in ("v4g", "v3"):
        t0 = time.time()
        dt = _timed_update(prior, row_lat, row_lon, obs, ngrid=ngrid,
                           kernel=kernel, tile=tile)
        out[f"{kernel}_seconds"] = dt
        out[f"{kernel}_wall_with_compile"] = time.time() - t0
        print(f"{kernel}: {dt:.4f} s/update "
              f"(wall incl. compile {out[f'{kernel}_wall_with_compile']:.1f} s)",
              flush=True)

    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
