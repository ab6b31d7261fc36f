#!/usr/bin/env python
"""Fixed-lag smoothing and incremental analysis update on Lorenz-96.

Two production mechanisms beyond the reference, both riding on the
cycling harness (see ``docs/design.md`` §2.7):

* ``smoother_lag=L`` — each cycle's observations re-analyze the previous
  L analyses through cross-time ensemble covariances (fixed-lag EnKS,
  Evensen & van Leeuwen 2000).  Reanalysis beats the real-time filter.
* ``iau_steps=N`` — analysis increments are applied as a constant
  forcing over the next window's substeps (Bloom et al. 1996) instead
  of direct insertion, suppressing insertion shock.

Run: ``python examples/cycling_smoother.py [--cycles 40] [--lag 3]``
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
    ap.add_argument("--lag", type=int, default=3)
    ap.add_argument("--iau", type=int, default=0,
                    help="IAU substeps per window (0 = direct insertion)")
    ap.add_argument("--nvars", type=int, default=40)
    ap.add_argument("--nmems", type=int, default=20)
    from efa_xray_tpu.utils.demo import add_platform_arg, apply_platform

    add_platform_arg(ap)
    args = ap.parse_args()
    apply_platform(args)

    truth, ens = l96.spinup_ensemble(nvars=args.nvars, nmems=args.nmems,
                                     seed=13)
    lats, lons = l96.fake_latlon(args.nvars)

    # With IAU the forecast callable is ONE substep; the harness applies
    # `iau_steps` of them per cycle.  Keep the window length (4 model
    # steps) identical either way.
    substeps = args.iau if args.iau > 0 else 1
    harness = CyclingHarness(
        forecast=lambda x: l96.integrate(x, nsteps=4 // substeps or 1),
        state_lats=lats,
        state_lons=lons,
        ob_error=1.0,
        localize_radius=4000.0,
        config=FilterConfig(localization="GC", dtype="float64", block_size=8),
        obs_operator_rows=np.arange(0, args.nvars, 2),
        inflation=1.05,
        smoother_lag=args.lag,
        iau_steps=args.iau,
    )
    stats = harness.run(ens, truth, ncycles=args.cycles, seed=113)

    filt = {s.cycle: s.analysis_rmse for s in stats}
    print(f"{'cyc':>4} {'filter_rmse':>12} {'smoothed_rmse':>14}")
    for c, r in harness.smoothed_rmse():
        if c % 5 == 0:
            print(f"{c:>4} {filt[c]:12.3f} {r:14.3f}")

    pairs = [(c, r) for c, r in harness.smoothed_rmse() if c >= 10]
    f_mean = float(np.mean([filt[c] for c, _ in pairs]))
    s_mean = float(np.mean([r for _, r in pairs]))
    print(f"\nmean over cycles 10+: filter {f_mean:.3f} -> "
          f"lag-{args.lag} smoothed {s_mean:.3f} "
          f"({100 * (1 - s_mean / f_mean):.0f}% better)")
    assert s_mean < f_mean, "smoother should beat the filter"


if __name__ == "__main__":
    main()
