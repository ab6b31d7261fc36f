#!/usr/bin/env python
"""Phase anatomy of the DEMO-scale public API floor (BASELINE config 0).

Round-4 verdict: the host fast path cut config 0 (5 obs x 4,800 points x
21 members through ``EnSRF(state, obs).update()``) from 1.91 s to 0.68 s,
but nobody measured where the remaining 0.68 s goes — the reference NumPy
loop does this workload in <1 ms.  This probe decomposes the floor:

  pull        ``jax.device_get(state.data)`` alone — the TPU->CPU prior
              transfer the fast path pays when the state was built on the
              (default) TPU device
  update_cpu  the full update with the prior ALREADY host-resident
              (isolates everything downstream of the pull)
  update_tpu  the full update from a TPU-resident prior (what
              bench_config0 measures; ~ pull + update_cpu)
  construct   EnSRF.__init__ alone (coerce + validate, host)
  taps        build_taps with a COLD module LRU (first-cycle cost; the
              timed config-0 number runs warm)
  posterior   format/posterior share, inferred as update_cpu - scan-side
              (reported via a no-diagnostics variant when cheap)

All phases are timed with repeats and min-takes (host-side work; the only
device interaction is the pull, and ``device_get`` genuinely blocks).
Reference anchor: the demo workload, ``efa_demo.ipynb`` cell 8.

Usage: python benchmarks/demo_anatomy.py [--repeats 5] [--json out]
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
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from efa_xray_tpu import EnSRF
    from efa_xray_tpu.observation import forward as _fwd
    from efa_xray_tpu.state.ensemble import EnsembleState
    from efa_xray_tpu.utils.demo_data import gefs_like_state, observations_from_truth

    state, truth = gefs_like_state(ny=20, nx=30, nmems=21, ntimes=8)
    obs = observations_from_truth(state, truth, 5, radius=2000.0)

    def timed(fn, repeats=args.repeats):
        vals = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            vals.append(time.perf_counter() - t0)
        return min(vals)

    # warm everything (compiles, taps LRU)
    warm, _ = EnSRF(state, obs, loc="GC", verbose=False).update()
    _ = float(jnp.sum(warm.data))

    out = {"config": "0-demo-anatomy", "backend": jax.default_backend(),
           "nstate": state.nstate(), "nmems": state.nmems(),
           "nobs": len(obs)}

    # -- the full update from a TPU-resident prior (bench_config0's view)
    def full_update():
        post, _ = EnSRF(state, obs, loc="GC", verbose=False).update()
        _ = float(jnp.sum(post.data))

    out["update_tpu_resident"] = timed(full_update)

    # -- the TPU->CPU pull alone
    out["pull"] = timed(lambda: jax.device_get(state.data))

    # -- the update with the prior already host-resident
    cpu = jax.devices("cpu")[0]
    state_cpu = EnsembleState(
        jax.device_put(jax.device_get(state.data), cpu), state.structure
    )

    def cpu_update():
        post, _ = EnSRF(state_cpu, obs, loc="GC", verbose=False).update()
        _ = float(jnp.sum(post.data))

    cpu_update()  # warm any host-resident-shape compiles
    out["update_cpu_resident"] = timed(cpu_update)

    # -- construction alone
    out["construct"] = timed(
        lambda: EnSRF(state_cpu, obs, loc="GC", verbose=False)
    )

    # -- cold taps build (config-0 timed numbers run LRU-warm)
    def cold_taps():
        _fwd._TAPS_CACHE.clear()
        with jax.default_device(cpu):
            EnSRF(state_cpu, obs, loc="GC", verbose=False).build_taps()

    out["taps_cold"] = timed(cold_taps)
    # restore the warm LRU for any later phase
    EnSRF(state_cpu, obs, loc="GC", verbose=False).build_taps()

    # -- diagnostics share: update with the per-ob diagnostic write-back
    #    suppressed is not a public switch; report the batched device_get
    #    cost instead by timing a second update on the SAME filter object
    #    (taps + obs arrays cached on the instance).
    filt = EnSRF(state_cpu, obs, loc="GC", verbose=False)

    def reuse_update():
        post, _ = filt.update()
        _ = float(jnp.sum(post.data))

    reuse_update()
    out["update_cpu_reused_filter"] = timed(reuse_update)

    out["inferred_pull_share"] = out["update_tpu_resident"] - out[
        "update_cpu_resident"]
    print(json.dumps(out, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
