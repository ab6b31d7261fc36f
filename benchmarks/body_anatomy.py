#!/usr/bin/env python
"""In-kernel anatomy of the fused v4 body sweep, measured by ablation.

The body is the last big bucket of the headline update (docs/design.md
§8): compute-bound at ~11% of f32 MXU peak, so SOMETHING inside the
alive panels burns ~9x the dense-FLOP time.  Candidates, each with a
timing-only ``ablate`` switch in the kernel
(`ops/ensrf_pallas_fused._make_fused_kernel`):

* ``d0``        the [B, M] x [M, TILE] priors matmul (dense MXU work)
* ``weights``   the chordal-angle + GC taper chain ([PANEL, TILE] VPU)
* ``panelcorr`` the [width, base] x [base, TILE] panel corrections (MXU)
* ``corr2``     the per-ob [1, t] x [t, TILE] left-looking matvecs —
                suspect #1: output has ONE sublane, so the MXU runs at
                <= 1/128 utilization
* ``final``     the rank-B mean/perturbation application matmuls (MXU)

Each ablation removes one piece; cost-by-difference against the full
kernel attributes the time.  An all-dead run (every ob's ``assim`` off
=> every panel culled) measures the grid + block-DMA overhead floor of
the 96k-step (row-tile x obs-block) grid, and a bf16 run bounds what
mixed-precision MXU issue could buy.

Usage: python benchmarks/body_anatomy.py [--workload pod] [--tile 8192]
"""

from __future__ import annotations

import argparse
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from benchmarks.breakdown import _chain_time, _make_workload, WORKLOADS
from efa_xray_tpu.assimilation import ensrf_core as core
from efa_xray_tpu.ops.ensrf_pallas_fused import _fused_impl


def measure_body(nstate, nmems, nobs, tile, iters, ablate=(), dtype=None,
                 dead=False, **_):
    bm, bp, tm, tp, blat, blon, obs = _make_workload(nstate, nmems, nobs)
    if dead:
        obs = obs._replace(assim=jnp.zeros(nobs, dtype=bool))
    tail = jax.block_until_ready(core.tail_scan_blocked(
        tm, tp, obs, localize=True, fast_geometry=True, panel=512,
        pallas_apply=not dead))
    if dtype is not None:
        bm, bp = bm.astype(dtype), bp.astype(dtype)
        tail = core.TailSolution(
            ye=tail.ye.astype(dtype), gain_coef=tail.gain_coef,
            sqrt_coef=tail.sqrt_coef, tail_mean=tail.tail_mean,
            tail_perts=tail.tail_perts, diags=tail.diags)

    # Production radius hint: the weight chain measured here is the one
    # EnSRF actually runs (sin-series + fitted GC outer since round 5).
    max_radius = float(np.max(np.asarray(obs.radii)))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def body_step(bm, bp):
        return _fused_impl(bm, bp, blat, blon, tail, obs, localize=True,
                           block_size=128, tile=tile, ablate=ablate,
                           max_radius_km=max_radius)

    t, _ = _chain_time(lambda a, b: body_step(a, b), (bm, bp),
                       lambda c: jnp.sum(c[0].astype(jnp.float32))
                       + jnp.sum(c[1][:, 0].astype(jnp.float32)),
                       iters=iters)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="pod")
    ap.add_argument("--tile", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()
    w = dict(WORKLOADS[args.workload])
    w.pop("iters", None)
    w.pop("panels_sweep", None)

    runs = [
        ("full", dict()),
        ("alldead", dict(dead=True)),
        ("no_corr2", dict(ablate=("corr2",))),
        ("no_weights", dict(ablate=("weights",))),
        ("no_panelcorr", dict(ablate=("panelcorr",))),
        ("no_d0_final", dict(ablate=("d0", "final"))),
        ("bf16_full", dict(dtype=jnp.bfloat16)),
    ]
    out = {"workload": args.workload, "tile": args.tile,
           "backend": jax.default_backend()}
    full = None
    for name, kw in runs:
        try:
            t = measure_body(tile=args.tile, iters=args.iters, **w, **kw)
        except Exception as e:
            out[name] = None
            out[name + "_error"] = repr(e)[:200]
            print(json.dumps({name: out[name + "_error"]}), flush=True)
            continue
        out[name] = t
        if name == "full":
            full = t
        elif full is not None and not name.startswith("bf16"):
            out[name + "_attributed"] = full - t
        print(json.dumps({name: t}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
