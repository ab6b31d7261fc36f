"""Colored (batched) Anderson inflation update (round 5): exactness vs
the sequential scan in the color order, and the builder's fallbacks."""

import numpy as np

import jax.numpy as jnp


def test_colored_inflation_update_matches_color_order_scan():
    """Same-colored supports are disjoint, so the colored batched update
    must equal the sequential scan over the COLOR-REORDERED batch.
    Tolerance note: the Anderson posterior-mode quadratic is
    ill-conditioned where l' is tiny (its root formula cancels), so
    1-ulp differences between the scalar-broadcast and gathered-vector
    evaluation of identical inputs amplify to ~1e-8 on lambda — physical
    lambda precision is ~1e-3."""
    from efa_xray_tpu.assimilation.adaptive_inflation import (
        build_obs_coloring,
        pack_color_tables,
        update_inflation_rows,
        update_inflation_rows_colored,
    )

    rng = np.random.default_rng(0)
    nrows, nobs = 700, 40
    rlat = rng.uniform(-70, 70, nrows)
    rlon = rng.uniform(0, 360, nrows)
    olat = rng.uniform(-65, 65, nobs)
    olon = rng.uniform(0, 360, nobs)
    radii = rng.choice([400.0, 900.0], nobs)
    innov = rng.normal(0, 2.0, nobs)
    pvar = rng.uniform(0.5, 3.0, nobs)
    ovar = np.ones(nobs)
    assim = rng.random(nobs) > 0.2
    lam0 = jnp.asarray(rng.uniform(1.0, 1.5, (2, 1, nrows)))

    coloring = build_obs_coloring(rlat, rlon, olat, olon, radii)
    assert coloring is not None
    order, sizes, row_ob = coloring
    assert sorted(order.tolist()) == list(range(nobs))
    attrs, use = pack_color_tables(order, sizes, olat, olon, radii,
                                   innov, pvar, ovar, assim)

    perm = lambda a: jnp.asarray(np.asarray(a)[order])
    rl = (jnp.asarray(rlat), jnp.asarray(rlon))
    for evolve in (False, True):
        sd = (jnp.full((2, 1, 1), 0.6) if not evolve
              else jnp.asarray(rng.uniform(0.2, 0.6, (2, 1, nrows))))
        want = update_inflation_rows(
            lam0, sd, *rl, perm(olat), perm(olon), perm(radii),
            perm(innov), perm(pvar), perm(ovar), perm(assim),
            lambda_min=1.0, lambda_max=2.0, evolve_sd=evolve, sd_min=0.1)
        got = update_inflation_rows_colored(
            lam0, sd, *rl, jnp.asarray(row_ob),
            jnp.asarray(attrs, dtype=lam0.dtype), jnp.asarray(use),
            lambda_min=1.0, lambda_max=2.0, evolve_sd=evolve, sd_min=0.1)
        if evolve:
            np.testing.assert_allclose(np.asarray(got[0]),
                                       np.asarray(want[0]),
                                       rtol=1e-7, atol=1e-7)
            np.testing.assert_allclose(np.asarray(got[1]),
                                       np.asarray(want[1]),
                                       rtol=1e-7, atol=1e-7)
        else:
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-7, atol=1e-7)
    # non-finite radius -> no coloring (gamma = 1 everywhere)
    radii_inf = radii.copy(); radii_inf[3] = np.inf
    assert build_obs_coloring(rlat, rlon, olat, olon, radii_inf) is None
