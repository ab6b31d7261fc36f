#!/usr/bin/env python
"""Randomized cross-path parity fuzzer (float64, 8 virtual CPU devices).

Each trial draws a random workload (state size, members, obs count,
geometry, mixed finite/inf/zero radii and errors, QC'd-out obs, duplicate
ob locations) and a random knob set (block size, unbiased variance,
vertical localization, hybrid static covariance, tail panel), then checks
that every execution path the framework offers produces the same answer:

* serial lax.scan  ==  NumPy float64 oracle (``tests/oracle_numpy.py``,
  plain-knob trials only — the oracle implements the reference algorithm,
  ``/root/reference/efa_xray/assimilation/ensrf.py:33-151``)  <= 1e-9 RMSE
* blocked two-phase ==  serial                                 <= 1e-9
* shard_map over a random 2/4/8-device mesh == blocked         <= 1e-9
* stochastic EnKF blocked == EnKF serial (same draws)          <= 1e-9

The suite pins a handful of adversarial cases; this fuzzer walks the
cross-product the suite cannot enumerate.  Any failure prints a
self-contained reproduction (seed + trial) and exits nonzero.

Usage:  python benchmarks/fuzz_parity.py [--trials N] [--minutes M]
        [--seed S]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, os.path.join(os.path.dirname(_here), "tests"))

from efa_xray_tpu.assimilation import ensrf_core as core  # noqa: E402
from efa_xray_tpu.assimilation import enkf as enkf_mod  # noqa: E402
from efa_xray_tpu.parallel import make_mesh  # noqa: E402
from efa_xray_tpu.parallel.sharded import ensrf_update_sharded  # noqa: E402
import oracle_numpy as oracle  # noqa: E402


def draw_trial(rng):
    ns = int(rng.integers(64, 2500))
    nm = int(rng.integers(5, 40))
    no = int(rng.integers(1, 250))
    t = {
        "ns": ns, "nm": nm, "no": no,
        "block_size": int(rng.choice([1, 3, 8, 32, 101, 128])),
        "unbiased": bool(rng.random() < 0.3),
        "localize": bool(rng.random() < 0.85),
        "vertical": bool(rng.random() < 0.25),
        "hybrid": bool(rng.random() < 0.25),
        "tail_panel": (int(rng.choice([4, 16, 64]))
                       if rng.random() < 0.3 else None),
        "mesh_n": int(rng.choice([2, 4, 8])),
        "enkf": bool(rng.random() < 0.3),
        "varloc": bool(rng.random() < 0.3),
    }
    if t["varloc"]:
        t["hybrid"] = False  # library forbids the combination
    return t


def build_workload(rng, t):
    ns, nm, no = t["ns"], t["nm"], t["no"]
    row_lat = rng.uniform(-85, 85, ns)
    row_lon = rng.uniform(0, 360, ns)
    prior = 280.0 + 5.0 * rng.standard_normal((ns, nm))
    rows = rng.integers(0, ns, no)
    if no >= 3:
        rows[0] = rows[1] = rows[2]  # duplicated ob locations
    ye = prior[rows] + 0.1 * rng.standard_normal((no, nm))
    values = ye.mean(1) + rng.normal(0, 1.0, no)
    errors = rng.uniform(0.25, 4.0, no)
    if no >= 5 and rng.random() < 0.5:
        errors[4] = 0.0  # R = 0 stays finite in the gain denominator
    radii = rng.uniform(300.0, 5000.0, no)
    radii[rng.random(no) < 0.2] = np.inf  # unlocalized obs mixed in
    assim = rng.random(no) > 0.15
    w = dict(
        prior=prior, ye=ye, row_lat=row_lat, row_lon=row_lon,
        values=values, errors=errors,
        ob_lat=row_lat[rows], ob_lon=row_lon[rows],
        radii=radii, assim=assim, rows=rows,
    )
    if t["vertical"]:
        w["body_vert"] = rng.uniform(100.0, 1000.0, ns)
        w["verts"] = rng.uniform(100.0, 1000.0, no)
        w["vert_radii"] = rng.uniform(100.0, 500.0, no)
    if t["hybrid"]:
        w["hybrid_alpha"] = float(rng.uniform(0.0, 1.0))
        w["body_sigma"] = rng.uniform(0.5, 3.0, ns)
        w["static_length"] = float(rng.uniform(300.0, 2000.0))
    if t["varloc"]:
        # Cross-variable localization: the core contract is ARBITRARY
        # per-row / per-ob variable indices (no var-major block
        # requirement), so fuzz exactly that, with hard zeros mixed in.
        nv = int(rng.integers(1, 4))
        fac = rng.uniform(0.0, 1.0, (nv, nv))
        fac[rng.random((nv, nv)) < 0.3] = 0.0
        w["varloc"] = fac
        w["row_var"] = rng.integers(0, nv, ns).astype(np.int32)
        w["ob_var"] = rng.integers(0, nv, no).astype(np.int32)
    return w


def obs_arrays(w, t):
    kw = dict(
        values=jnp.asarray(w["values"]),
        errors=jnp.asarray(w["errors"]),
        lats=jnp.asarray(w["ob_lat"]),
        lons=jnp.asarray(w["ob_lon"]),
        radii=jnp.asarray(w["radii"]),
        assim=jnp.asarray(w["assim"]),
    )
    if t["vertical"]:
        kw["verts"] = jnp.asarray(w["verts"])
        kw["vert_radii"] = jnp.asarray(w["vert_radii"])
    return core.ObsArrays(**kw)


def split_mean_perts(mat):
    m = jnp.mean(mat, axis=1)
    return m, mat - m[:, None]


def knob_kwargs(w, t):
    kw = dict(localize=t["localize"], unbiased=t["unbiased"],
              vertical=t["vertical"])
    if t["vertical"]:
        kw["body_vert"] = jnp.asarray(w["body_vert"])
    if t["varloc"]:
        kw.update(varloc=jnp.asarray(w["varloc"]),
                  row_var=jnp.asarray(w["row_var"]),
                  ob_var=jnp.asarray(w["ob_var"]))
    if t["hybrid"]:
        rows_sigma = jnp.asarray(w["body_sigma"])
        kw.update(
            hybrid_alpha=w["hybrid_alpha"],
            body_sigma=rows_sigma,
            # obs sit on state rows; the tail sigma of an ob is its row's —
            # heterogeneous, so tail-sigma plumbing (ordering, sharding
            # replication) is actually exercised by every hybrid trial
            tail_sigma=rows_sigma[jnp.asarray(w["rows"])],
            static_length=w["static_length"],
        )
    return kw


def posterior(bm, bp):
    return np.asarray(bm)[:, None] + np.asarray(bp)


def rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


def run_trial(seed, idx):
    rng = np.random.default_rng((seed, idx))
    t = draw_trial(rng)
    w = build_workload(rng, t)
    obs = obs_arrays(w, t)
    bm, bp = split_mean_perts(jnp.asarray(w["prior"]))
    tm, tp = split_mean_perts(jnp.asarray(w["ye"]))
    args = (bm, bp, tm, tp, jnp.asarray(w["row_lat"]),
            jnp.asarray(w["row_lon"]), obs)
    kw = knob_kwargs(w, t)

    checks = {}
    if t["enkf"] and not t["hybrid"]:
        eps = enkf_mod.draw_ob_perturbations(
            jax.random.PRNGKey(idx), obs.errors, t["nm"])
        ekw = {k: v for k, v in kw.items()
               if k in ("localize", "unbiased", "vertical", "body_vert",
                        "varloc", "row_var", "ob_var")}
        s = enkf_mod.enkf_serial(*args, eps, **ekw)
        b = enkf_mod.enkf_blocked(*args, eps,
                                  block_size=t["block_size"], **ekw)
        checks["enkf blocked vs serial"] = rmse(
            posterior(b[0], b[1]), posterior(s[0], s[1]))
    else:
        sbm, sbp, *_ = core.ensrf_serial(*args, **kw)
        post_serial = posterior(sbm, sbp)
        bbm, bbp, *_ = core.ensrf_blocked(
            *args, block_size=t["block_size"], tail_panel=t["tail_panel"],
            **kw)
        checks["blocked vs serial"] = rmse(posterior(bbm, bbp), post_serial)

        plain = not (t["vertical"] or t["hybrid"])
        if plain:
            okw = (dict(varloc=w["varloc"], row_var=w["row_var"],
                        ob_var=w["ob_var"]) if t["varloc"] else {})
            want, _ = oracle.serial_ensrf(
                w["prior"], w["ye"], w["values"], w["errors"],
                w["ob_lat"], w["ob_lon"], w["radii"],
                w["row_lat"], w["row_lon"], w["assim"],
                localize=t["localize"], unbiased=t["unbiased"], **okw,
            )
            checks["serial vs oracle"] = rmse(post_serial, want)

        mesh = make_mesh(jax.devices("cpu")[: t["mesh_n"]])
        mbm, mbp, *_ = ensrf_update_sharded(
            *args, mesh=mesh, method="blocked",
            block_size=t["block_size"], **kw)
        checks["sharded vs serial"] = rmse(posterior(mbm, mbp), post_serial)

        # chunked body sweep (the r5 obs-chunked driver's algebra:
        # tail solved once, pre-solved sequence applied to the body in
        # slices) == serial, for a random chunk width incl. ragged tails
        if not (t["vertical"] or t["hybrid"] or t["varloc"]):
            chunk = int(rng.integers(1, t["no"] + 2))
            tail = core.tail_scan(tm, tp, obs, localize=t["localize"],
                                  unbiased=t["unbiased"])
            cbm, cbp = bm, bp
            for i0 in range(0, t["no"], chunk):
                cut = lambda a: a[i0:min(i0 + chunk, t["no"])]
                cbm, cbp = core.ensrf_blocked_body(
                    cbm, cbp, args[4], args[5],
                    jax.tree.map(cut, tail), jax.tree.map(cut, obs),
                    localize=t["localize"], block_size=t["block_size"])
            checks["chunked body vs serial"] = rmse(
                posterior(cbm, cbp), post_serial)

    bad = {k: v for k, v in checks.items() if not (v <= 1e-9)}
    return t, checks, bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=50)
    ap.add_argument("--minutes", type=float, default=None,
                    help="stop after this many minutes instead of --trials")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    t0 = time.time()
    n = 0
    worst = 0.0
    while True:
        if args.minutes is not None:
            if (time.time() - t0) / 60.0 >= args.minutes:
                break
        elif n >= args.trials:
            break
        t, checks, bad = run_trial(args.seed, n)
        worst = max(worst, *checks.values())
        if bad:
            print(json.dumps({
                "FAIL": bad, "trial": n, "seed": args.seed, "config": t,
                "repro": f"run_trial({args.seed}, {n})",
            }, default=str), flush=True)
            sys.exit(1)
        n += 1
        if n % 10 == 0:
            jax.clear_caches()  # bound compile-cache growth on long runs
            print(f"{n} trials OK ({time.time()-t0:.0f}s, "
                  f"worst rmse {worst:.3e})", flush=True)
    print(json.dumps({
        "config": "fuzz-parity", "trials": n, "seed": args.seed,
        "worst_rmse": worst, "tolerance": 1e-9, "failures": 0,
        "minutes": round((time.time() - t0) / 60.0, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
