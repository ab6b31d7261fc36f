#!/usr/bin/env python
"""Interactive EFA viewer — the live twin of ``efa_demo.ipynb`` cells 14-16.

With a GUI matplotlib backend (or in a notebook with ipywidgets) you get
live sliders for observation count / error / inflation; headless, pass
``--save out.png`` to render one frame.

Run: ``python examples/interactive_viewer.py [--save viewer.png]``
     (demo-scale problem — run on CPU: ``JAX_PLATFORMS=cpu``)
"""

import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save", default=None, help="render headless to a PNG")
    ap.add_argument("--n-obs", type=int, default=5)
    ap.add_argument("--ob-error", type=float, default=1.0)
    ap.add_argument("--inflation", type=float, default=1.0)
    from efa_xray_tpu.utils.demo import add_platform_arg, apply_platform

    add_platform_arg(ap)
    args = ap.parse_args()
    apply_platform(args)

    import matplotlib

    if args.save:
        matplotlib.use("Agg")
    from efa_xray_tpu.postprocess.viewer import assimilation_viewer

    viewer = assimilation_viewer(
        n_obs=args.n_obs, ob_error=args.ob_error, inflation=args.inflation
    )
    if args.save:
        viewer.save(args.save)
        print(f"saved {args.save}")
    else:
        import matplotlib.pyplot as plt

        plt.show()


if __name__ == "__main__":
    main()
