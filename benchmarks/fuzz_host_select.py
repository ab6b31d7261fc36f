#!/usr/bin/env python
"""Randomized fuzzer for the host-certified LETKF obs selection
(``letkf_topk="host"``): the EXACTNESS claim rests on a geometric
coverage certificate, which is precisely the kind of claim a fuzzer
should hammer.

Each trial draws a random geometry — grid layout (uniform scatter,
clustered, raster rows, adversarially SHUFFLED order), obs layout
(uniform, heavily clustered, duplicated locations, tiny counts),
selection knobs (k, patch_size, chunk, bundle size incl. auto) — and
checks:

1. **Certificate**: every patch's brute-force float64 top-k obs set is
   contained in its bundle's candidate set;
2. **End-to-end exactness**: ``letkf_update`` with ``topk='host'``
   produces a posterior bitwise-equal to ``topk='exact'`` (CPU f64).

Any failure prints a self-contained reproduction (seed + trial) and
exits nonzero.

Usage: python benchmarks/fuzz_host_select.py [--trials N] [--minutes M]
       [--seed S]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))

from efa_xray_tpu.assimilation import ensrf_core as core  # noqa: E402
from efa_xray_tpu.assimilation import letkf_core as lc  # noqa: E402


def _unit(lat, lon):
    la, lo = np.radians(lat), np.radians(lon)
    cl = np.cos(la)
    return np.stack([cl * np.cos(lo), cl * np.sin(lo), np.sin(la)], -1)


def draw_geometry(rng):
    ngrid = int(rng.integers(40, 1200))
    layout = rng.choice(["uniform", "clustered", "raster", "shuffled"])
    if layout == "raster":
        ny = int(rng.integers(4, 24))
        nx = -(-ngrid // ny)
        ngrid = ny * nx
        lat1 = np.linspace(-80, 80, ny)
        lon1 = np.linspace(0, 357, nx)
        lon, lat = np.meshgrid(lon1, lat1)
        glat, glon = lat.ravel(), lon.ravel()
    else:
        glat = rng.uniform(-85, 85, ngrid)
        glon = rng.uniform(0, 360, ngrid)
        if layout == "clustered":
            ncl = int(rng.integers(1, 5))
            ci = rng.integers(0, ncl, ngrid)
            clat = rng.uniform(-70, 70, ncl)
            clon = rng.uniform(0, 360, ncl)
            glat = np.clip(clat[ci] + rng.normal(0, 3, ngrid), -89, 89)
            glon = (clon[ci] + rng.normal(0, 3, ngrid)) % 360
        if layout != "shuffled":
            # space-curve-ish sort: lexicographic on coarse cells
            order = np.lexsort((glon // 10, glat // 10))
            glat, glon = glat[order], glon[order]

    nobs = int(rng.integers(1, 400))
    olat = rng.uniform(-85, 85, nobs)
    olon = rng.uniform(0, 360, nobs)
    if rng.random() < 0.4:  # pile most obs in one small box
        m = rng.random(nobs) < 0.85
        olat[m] = rng.uniform(20, 30, m.sum())
        olon[m] = rng.uniform(100, 110, m.sum())
    if nobs > 3 and rng.random() < 0.3:  # exact duplicate locations
        dup = rng.integers(0, nobs, nobs // 3)
        olat[-len(dup):] = olat[dup]
        olon[-len(dup):] = olon[dup]
    return layout, glat, glon, olat, olon


def run_trial(rng, trial, seed):
    layout, glat, glon, olat, olon = draw_geometry(rng)
    ngrid, nobs = glat.size, olat.size
    patch = int(rng.choice([1, 2, 4, 8]))
    k = int(rng.choice([1, 3, 8, 16, 64, nobs + 5]))
    chunk = int(rng.choice([8, 50, 128, 512]))
    group = int(rng.choice([4, 16, 64]))
    auto = bool(rng.random() < 0.5)

    cand, mask, geff = lc.host_select_candidates(
        glat, glon, ngrid, patch, olat, olon, k, chunk=chunk,
        group=group, auto_group=auto)
    ctx = dict(trial=trial, seed=seed, layout=str(layout), ngrid=ngrid,
               nobs=nobs, patch=patch, k=k, chunk=chunk, group=group,
               auto=auto, geff=geff, S=int(cand.shape[1]))

    # 1. certificate vs float64 brute force
    kk = min(k, nobs)
    npatch = -(-ngrid // patch)
    gx = _unit(glat, glon)
    pad = npatch * patch - ngrid
    if pad:
        gx = np.concatenate([gx, np.repeat(gx[-1:], pad, axis=0)])
    px = gx.reshape(npatch, patch, 3).mean(1)
    px /= np.maximum(np.linalg.norm(px, axis=-1, keepdims=True), 1e-12)
    ox = _unit(olat, olon)
    d = np.linalg.norm(ox[None, :, :] - px[:, None, :], axis=-1)
    order = np.argsort(d, axis=1, kind="stable")[:, :kk]
    for p in range(npatch):
        grp = p // geff
        cands = set(cand[grp][mask[grp]])
        missing = set(order[p]) - cands
        if missing:
            raise AssertionError(
                f"certificate violated: patch {p} missing {missing} "
                f"({json.dumps(ctx)})")

    # 1b. the SELECTED indices (set AND order) match the device-exact
    # semantics: same f32 dots, top_k over all obs vs over candidates.
    dots = np.asarray(jnp.einsum(
        "pc,oc->po", jnp.asarray(px), jnp.asarray(ox),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST))
    for p in range(npatch):
        ii_e = np.asarray(jax.lax.top_k(jnp.asarray(dots[p]), kk)[1])
        cl, m = cand[p // geff], mask[p // geff]
        dsub = np.where(m, dots[p][cl], -np.inf)
        ii_h = cl[np.asarray(jax.lax.top_k(jnp.asarray(dsub), kk)[1])]
        if not np.array_equal(ii_e, ii_h):
            raise AssertionError(
                f"selection differs at patch {p}: exact {ii_e[:8]}... "
                f"host {ii_h[:8]}... ({json.dumps(ctx)})")

    # 2. end-to-end bitwise parity host vs exact
    nm = int(rng.integers(4, 16))
    prior = 280.0 + 5.0 * rng.standard_normal((ngrid, nm))
    rows = rng.integers(0, ngrid, nobs)
    ye = prior[rows]
    obs = core.ObsArrays(
        values=jnp.asarray(ye.mean(1) + rng.normal(0, 1, nobs)),
        errors=jnp.asarray(rng.uniform(0.25, 4.0, nobs)),
        lats=jnp.asarray(olat), lons=jnp.asarray(olon),
        radii=jnp.asarray(rng.choice([500.0, 2000.0, np.inf], nobs)),
        assim=jnp.asarray(rng.random(nobs) < 0.9),
    )
    bm = jnp.asarray(prior.mean(1))
    bp = jnp.asarray(prior - prior.mean(1, keepdims=True))
    tm = jnp.asarray(ye.mean(1))
    tp = jnp.asarray(ye - ye.mean(1, keepdims=True))
    gl, go = jnp.asarray(glat), jnp.asarray(glon)
    # sqrt_method="eigh": the selections were proven identical above, so
    # any end-to-end difference is compiled-program numerics.  The
    # Newton-Schulz while_loop's stall exit can fire one iteration apart
    # in two differently-fused programs (observed: ~1e-6 mean deltas at
    # f64 — both within NS's own accuracy, neither "wrong"); eigh is a
    # deterministic custom call, leaving only einsum reassociation
    # (observed ~5e-16).
    kw = dict(ngrid=ngrid, patch_size=patch, k_obs=k, localize=True,
              chunk=chunk, sqrt_method="eigh")
    r_exact = lc.letkf_update(bm, bp, tm, tp, gl, go, obs,
                              topk_method="exact", **kw)
    r_host = lc.letkf_update(bm, bp, tm, tp, gl, go, obs,
                             topk_method="host", sel_cand=jnp.asarray(cand),
                             sel_mask=jnp.asarray(mask), sel_group=geff,
                             **kw)
    for name, a, b in (("mean", r_exact[0], r_host[0]),
                       ("perts", r_exact[1], r_host[1])):
        a, b = np.asarray(a), np.asarray(b)
        mx = float(np.max(np.abs(a - b))) if a.size else 0.0
        if mx > 1e-11 * max(1.0, float(np.max(np.abs(a)))):
            raise AssertionError(
                f"host != exact ({name}, maxabs {mx:.3e}): "
                f"{json.dumps(ctx)}")
    return ctx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=200)
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    t0 = time.time()
    rng = np.random.default_rng(args.seed)
    done = 0
    for trial in range(args.trials):
        if (time.time() - t0) / 60.0 > args.minutes:
            break
        run_trial(rng, trial, args.seed)
        done += 1
        # every trial compiles fresh shapes; without this the CPU
        # backend's JIT memory grows until LLVM fails to allocate
        # (the same leak tests/conftest.py clears per module)
        jax.clear_caches()
        if done % 10 == 0:
            print(json.dumps({"trials_ok": done,
                              "minutes": round((time.time() - t0) / 60, 1)}),
                  flush=True)
    print(json.dumps({"result": "PASS", "trials_ok": done,
                      "minutes": round((time.time() - t0) / 60, 1)}))


if __name__ == "__main__":
    main()
