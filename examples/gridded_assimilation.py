#!/usr/bin/env python
"""Gridded assimilation demo: CONUS-scale synthetic ensemble + point obs.

Shows the full production path: build a gridded EnsembleState, assimilate a
network of localized surface observations (BASELINE config-2 shape),
verify with the postprocess statistics table, checkpoint to netCDF, and
(optionally) run sharded over all local devices.

Run: ``python examples/gridded_assimilation.py [--nobs 200] [--mesh]``
"""

import argparse
import time

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from efa_xray_tpu import EnSRF, LETKF, EnsembleState, obs_assimilation_statistics
from efa_xray_tpu.config import FilterConfig
from efa_xray_tpu.utils.demo_data import gefs_like_state, observations_from_truth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nobs", type=int, default=200)
    ap.add_argument("--ny", type=int, default=33)
    ap.add_argument("--nx", type=int, default=49)
    ap.add_argument("--nmems", type=int, default=21)
    ap.add_argument("--radius", type=float, default=1000.0)
    ap.add_argument("--inflation", type=float, default=1.05)
    ap.add_argument("--mesh", action="store_true", help="shard over all devices")
    ap.add_argument("--solver", choices=["ensrf", "letkf"], default="ensrf",
                    help="serial square-root filter (reference parity) or "
                    "all-at-once local transform filter")
    ap.add_argument("--out", default=None, help="netCDF output path")
    ap.add_argument("--plot", default=None,
                    help="save a localization-footprint map (with the "
                         "built-in coastline overlay) to this PNG path")
    from efa_xray_tpu.utils.demo import add_platform_arg, apply_platform

    add_platform_arg(ap)
    args = ap.parse_args()
    apply_platform(args)

    state, truth = gefs_like_state(ny=args.ny, nx=args.nx, nmems=args.nmems)
    obs = observations_from_truth(state, truth, args.nobs, radius=args.radius)
    print(f"state: {state!r}; {len(obs)} obs")

    mesh = None
    if args.mesh:
        from efa_xray_tpu.parallel import make_mesh

        mesh = make_mesh()
        print(f"mesh: {mesh}")

    cfg = FilterConfig(localization="GC", method="blocked")
    solver_cls = LETKF if args.solver == "letkf" else EnSRF
    filt = solver_cls(state, obs, inflation=args.inflation, config=cfg, mesh=mesh)
    t0 = time.perf_counter()
    post, batch = filt.update()
    np.asarray(post.data)  # force completion before timing
    print(f"update: {time.perf_counter()-t0:.2f}s")

    df = obs_assimilation_statistics(state, post, batch)
    prior_rmse = np.sqrt(np.mean((df["value"] - df["prior mean"]) ** 2))
    post_rmse = np.sqrt(np.mean((df["value"] - df["post mean"]) ** 2))
    print(df.head(8).to_string())
    print(f"obs-space RMSE: prior={prior_rmse:.3f} posterior={post_rmse:.3f}")

    # field-space verification against the known truth
    tr = np.transpose(truth, (3, 0, 1, 2))  # [V,T,Y,X]
    prior_field_rmse = np.sqrt(np.mean((np.asarray(state.ensemble_mean()) - tr) ** 2))
    post_field_rmse = np.sqrt(np.mean((np.asarray(post.ensemble_mean()) - tr) ** 2))
    print(
        f"field RMSE vs truth: prior={prior_field_rmse:.3f} "
        f"posterior={post_field_rmse:.3f}"
    )

    if args.out:
        post.save_to_disk(args.out)
        print(f"posterior checkpointed to {args.out}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        # localization footprint of the first ob, with the built-in
        # coastline overlay (reference observation.py:94-115 via Basemap)
        ax = obs[0].map_localization(state)
        ax.figure.savefig(args.plot, dpi=110, bbox_inches="tight")
        print(f"localization footprint map -> {args.plot}")


if __name__ == "__main__":
    main()
