#!/usr/bin/env python
"""Production-style cycling DA on Lorenz-96 with adaptive inflation.

Demonstrates the full operational loop the reference only sketches:
forecast -> (adaptively) inflate -> assimilate -> learn inflation from
innovations -> verify -> repeat.  Adaptive inflation is a first-class
CyclingHarness option (``adaptive_inflation=True``, Anderson 2009); the
same machinery is available on gridded states through
``EnSRF(inflation=AdaptiveInflation(...))``.

Run: ``python examples/cycling_adaptive.py [--cycles 40]``
"""

import argparse

import numpy as np

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from efa_xray_tpu.config import FilterConfig
from efa_xray_tpu.models import lorenz96 as l96
from efa_xray_tpu.models.cycling import CyclingHarness


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=40)
    ap.add_argument("--nvars", type=int, default=40)
    ap.add_argument("--nmems", type=int, default=20)
    ap.add_argument("--ob-error", type=float, default=1.0)
    from efa_xray_tpu.utils.demo import add_platform_arg, apply_platform

    add_platform_arg(ap)
    args = ap.parse_args()
    apply_platform(args)

    truth, ens = l96.spinup_ensemble(nvars=args.nvars, nmems=args.nmems, seed=7)
    lats, lons = l96.fake_latlon(args.nvars)

    harness = CyclingHarness(
        forecast=lambda x: l96.integrate(x, nsteps=4),
        state_lats=lats,
        state_lons=lons,
        ob_error=args.ob_error,
        localize_radius=4000.0,
        config=FilterConfig(localization="GC", dtype="float64", block_size=8),
        obs_operator_rows=np.arange(0, args.nvars, 2),
        adaptive_inflation=True,  # Anderson-2009 variance inflation, learned
        # Evolve the inflation std too (Anderson §4): the shrinking sd is
        # the principled self-damping, so no adaptive_max cap is needed
        # (docs/recipes.md; benchmarks/l96_evolve_scan.py).
        adaptive_sd_evolve=True,
        adaptive_sd_min=0.15,
    )
    stats = harness.run(ens, truth, ncycles=args.cycles, seed=107)

    print(f"{'cyc':>4} {'bg_rmse':>8} {'an_rmse':>8} {'spread':>7}")
    for s in stats:
        if s.cycle % 5 == 0 or s.cycle == args.cycles - 1:
            print(f"{s.cycle:>4} {s.background_rmse:8.3f} "
                  f"{s.analysis_rmse:8.3f} {s.mean_spread:7.3f}")
    lam = harness.inflation_field()
    print(f"learned inflation field: mean={lam.mean():.3f} max={lam.max():.3f}")

    tail = np.mean([s.analysis_rmse for s in stats[-8:]])
    assert tail < np.sqrt(args.ob_error), "cycling did not converge"
    print("converged: analysis RMSE below observation error")


if __name__ == "__main__":
    main()
