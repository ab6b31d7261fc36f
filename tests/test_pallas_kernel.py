"""Fused Pallas phase-2 kernel vs the XLA reference path (interpret mode on
CPU; the same kernel compiles with Mosaic on real TPUs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import make_demo_obs, make_demo_state
from efa_xray_tpu.assimilation import ensrf_core as core
from efa_xray_tpu.observation import forward as fwd
from efa_xray_tpu.observation.observation import ObservationBatch
from efa_xray_tpu.ops.ensrf_pallas import (
    apply_obs_block_pallas,
    ensrf_blocked_body_pallas,
)


def _setup(nobs=12, nmems=16, seed=4, dtype=jnp.float32):
    state = make_demo_state(ntimes=2, ny=8, nx=8, nmems=nmems, seed=seed)
    obs = make_demo_obs(state, nobs=nobs, seed=seed + 1, radius=700.0)
    batch = ObservationBatch.coerce(obs)
    s = state.structure
    taps = fwd.build_taps(s, batch.lats, batch.lons, batch.times_s,
                          batch.var_indices(s))
    prior = jnp.asarray(np.asarray(state.to_vect()), dtype=dtype)
    ye = fwd.apply_taps_obj(prior, taps)
    row_lat, row_lon = s.row_latlon()
    obs_arr = core.ObsArrays(
        values=jnp.asarray(batch.values, dtype=dtype),
        errors=jnp.asarray(batch.errors, dtype=dtype),
        lats=jnp.asarray(batch.lats, dtype=dtype),
        lons=jnp.asarray(batch.lons, dtype=dtype),
        radii=jnp.asarray(batch.localize_radius, dtype=dtype),
        assim=jnp.asarray(batch.assimilate_flags & taps.qc_ok),
    )
    bm = jnp.mean(prior, axis=1)
    bp = prior - bm[:, None]
    tm = jnp.mean(ye, axis=1).astype(dtype)
    tp = (ye - jnp.mean(ye, axis=1)[:, None]).astype(dtype)
    return (bm, bp, tm, tp,
            jnp.asarray(row_lat, dtype=dtype), jnp.asarray(row_lon, dtype=dtype),
            obs_arr)


@pytest.mark.parametrize("localize", [True, False])
def test_single_block_matches_xla(localize):
    bm, bp, tm, tp, blat, blon, obs = _setup(nobs=8)
    tail = core.tail_scan(tm, tp, obs, localize=localize)

    if localize:
        from efa_xray_tpu.observation.localization import gaspari_cohn, haversine

        d = haversine((blat[:, None], blon[:, None]),
                      (obs.lats[None, :], obs.lons[None, :]))
        w = gaspari_cohn(d, obs.radii[None, :]).astype(bp.dtype)
    else:
        w = None
    bm_x, bp_x = core.apply_obs_block(bm, bp, tail.ye, tail.gain_coef,
                                      tail.sqrt_coef, w)
    bm_p, bp_p = apply_obs_block_pallas(
        bm, bp, blat, blon, tail.ye, tail.gain_coef, tail.sqrt_coef,
        obs.lats, obs.lons, obs.radii,
        localize=localize, tile=64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(bm_p), np.asarray(bm_x), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bp_p), np.asarray(bp_x), rtol=2e-5, atol=1e-4)


def test_full_blocked_body_matches_xla_multiple_blocks():
    bm, bp, tm, tp, blat, blon, obs = _setup(nobs=13)
    tail = core.tail_scan(tm, tp, obs, localize=True)
    bm_x, bp_x = core.ensrf_blocked_body(bm, bp, blat, blon, tail, obs,
                                         localize=True, block_size=4)
    bm_p, bp_p = ensrf_blocked_body_pallas(bm, bp, blat, blon, tail, obs,
                                           localize=True, block_size=4,
                                           tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(bm_p), np.asarray(bm_x), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bp_p), np.asarray(bp_x), rtol=2e-5, atol=1e-4)


def test_pallas_respects_row_padding():
    """Row count not a multiple of the tile: padded rows must not leak."""
    bm, bp, tm, tp, blat, blon, obs = _setup(nobs=5)
    tail = core.tail_scan(tm, tp, obs, localize=True)
    nrows = bm.shape[0]
    assert nrows % 48 != 0
    bm_p, bp_p = apply_obs_block_pallas(
        bm, bp, blat, blon, tail.ye, tail.gain_coef, tail.sqrt_coef,
        obs.lats, obs.lons, obs.radii, localize=True, tile=48, interpret=True,
    )
    assert bm_p.shape == (nrows,)
    assert bp_p.shape == bp.shape
    assert np.isfinite(np.asarray(bp_p)).all()


def test_grid_mode_matches_flat_mode():
    """ngrid (shared-grid weights, VT groups) must equal the flat path."""
    bm, bp, tm, tp, blat, blon, obs = _setup(nobs=9, nmems=12)
    tail = core.tail_scan(tm, tp, obs, localize=True)
    nrows = bm.shape[0]
    ngrid = 64  # state built as 2 times x (8x8) grid x 1 var -> 128 rows
    assert nrows == 2 * ngrid

    flat = apply_obs_block_pallas(
        bm, bp, blat, blon, tail.ye, tail.gain_coef, tail.sqrt_coef,
        obs.lats, obs.lons, obs.radii, localize=True, tile=64, interpret=True,
    )
    grid = apply_obs_block_pallas(
        bm, bp, blat, blon, tail.ye, tail.gain_coef, tail.sqrt_coef,
        obs.lats, obs.lons, obs.radii, localize=True, tile=64, interpret=True,
        ngrid=ngrid,
    )
    np.testing.assert_allclose(np.asarray(grid[0]), np.asarray(flat[0]),
                               rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grid[1]), np.asarray(flat[1]),
                               rtol=2e-5, atol=1e-4)


def test_grid_mode_with_nondividing_tile():
    """Grid smaller than / not dividing the tile: padding must stay inert."""
    bm, bp, tm, tp, blat, blon, obs = _setup(nobs=5, nmems=8)
    tail = core.tail_scan(tm, tp, obs, localize=True)
    flat = apply_obs_block_pallas(
        bm, bp, blat, blon, tail.ye, tail.gain_coef, tail.sqrt_coef,
        obs.lats, obs.lons, obs.radii, localize=True, tile=48, interpret=True,
    )
    grid = apply_obs_block_pallas(
        bm, bp, blat, blon, tail.ye, tail.gain_coef, tail.sqrt_coef,
        obs.lats, obs.lons, obs.radii, localize=True, tile=48, interpret=True,
        ngrid=64,
    )
    np.testing.assert_allclose(np.asarray(grid[1]), np.asarray(flat[1]),
                               rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("localize", [True, False])
def test_fused_v4_matches_v3(localize):
    """The fully-fused kernel (state crosses HBM once) must match the
    per-block kernel."""
    from efa_xray_tpu.ops.ensrf_pallas_fused import ensrf_blocked_body_pallas_fused

    bm, bp, tm, tp, blat, blon, obs = _setup(nobs=13, nmems=16)
    tail = core.tail_scan(tm, tp, obs, localize=localize)
    v3 = ensrf_blocked_body_pallas(
        bm, bp, blat, blon, tail, obs, localize=localize, block_size=4,
        tile=64, interpret=True, fast_geometry=True,
    )
    v4 = ensrf_blocked_body_pallas_fused(
        bm, bp, blat, blon, tail, obs, localize=localize, block_size=4,
        tile=64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(v4[0]), np.asarray(v3[0]),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(v4[1]), np.asarray(v3[1]),
                               rtol=2e-5, atol=2e-4)


def test_fused_v4_odd_row_count():
    """nrows not a multiple of the tile (or of 8): Pallas edge-tile masking
    must keep results exact and output shapes equal to input shapes (the
    donation-aliasing contract: in/out buffers match for ANY row count)."""
    from efa_xray_tpu.ops.ensrf_pallas_fused import ensrf_blocked_body_pallas_fused

    bm, bp, tm, tp, blat, blon, obs = _setup(nobs=9, nmems=12, seed=3)
    n = 123  # 128 grid rows -> 123: not a multiple of 8 or the tile
    bm, bp, blat, blon = bm[:n], bp[:n], blat[:n], blon[:n]
    tail = core.tail_scan(tm, tp, obs, localize=True)
    ref = core.ensrf_blocked_body(bm, bp, blat, blon, tail, obs,
                                  localize=True, block_size=3,
                                  fast_geometry=True)
    v4 = ensrf_blocked_body_pallas_fused(
        bm, bp, blat, blon, tail, obs, localize=True, block_size=3,
        tile=48, interpret=True,
    )
    assert v4[0].shape == bm.shape and v4[1].shape == bp.shape
    np.testing.assert_allclose(np.asarray(v4[0]), np.asarray(ref[0]),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(v4[1]), np.asarray(ref[1]),
                               rtol=2e-5, atol=2e-4)


def test_fused_v4_matches_xla_exact():
    """v4 vs the exact-geometry XLA blocked path (weight-formula tolerance)."""
    from efa_xray_tpu.ops.ensrf_pallas_fused import ensrf_blocked_body_pallas_fused

    bm, bp, tm, tp, blat, blon, obs = _setup(nobs=9, nmems=12, seed=8)
    tail = core.tail_scan(tm, tp, obs, localize=True)
    ref = core.ensrf_blocked_body(bm, bp, blat, blon, tail, obs,
                                  localize=True, block_size=3)
    v4 = ensrf_blocked_body_pallas_fused(
        bm, bp, blat, blon, tail, obs, localize=True, block_size=3,
        tile=48, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(v4[0]), np.asarray(ref[0]),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(v4[1]), np.asarray(ref[1]),
                               rtol=2e-4, atol=2e-3)


def test_fused_v4_gridded_state_with_vertical():
    """v4 on a vt>1 gridded state with vertical localization must match the
    exact XLA blocked path (per-row weights are exact for gridded rows)."""
    from efa_xray_tpu.ops.ensrf_pallas_fused import ensrf_blocked_body_pallas_fused

    bm, bp, tm, tp, blat, blon, obs = _setup(nobs=9, nmems=12, seed=6)
    nrows = bm.shape[0]  # 2 times x 64 grid points
    rng = np.random.default_rng(0)
    body_vert = jnp.asarray(
        np.repeat([500.0, 850.0], nrows // 2), dtype=bp.dtype
    )
    obs = obs._replace(
        verts=jnp.asarray(rng.uniform(400, 900, obs.values.shape[0]),
                          dtype=bp.dtype),
        vert_radii=jnp.asarray(
            np.where(np.arange(obs.values.shape[0]) % 3 == 0, np.inf, 300.0),
            dtype=bp.dtype),
    )
    tail = core.tail_scan(tm, tp, obs, localize=True)
    ref = core.ensrf_blocked_body(
        bm, bp, blat, blon, tail, obs, localize=True, block_size=3,
        fast_geometry=True, body_vert=body_vert, vertical=True,
    )
    v4 = ensrf_blocked_body_pallas_fused(
        bm, bp, blat, blon, tail, obs, body_vert=body_vert,
        localize=True, block_size=3, tile=48, interpret=True, vertical=True,
    )
    np.testing.assert_allclose(np.asarray(v4[0]), np.asarray(ref[0]),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(v4[1]), np.asarray(ref[1]),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("vertical", [False, True])
def test_fused_v4_grid_matches_flat(vertical):
    """v4-grid (per-grid-point weights streamed from XLA, state resident
    across all blocks) must match the per-row v4 on a vt>1 gridded state."""
    from efa_xray_tpu.ops.ensrf_pallas_fused import (
        ensrf_blocked_body_pallas_fused,
        ensrf_blocked_body_pallas_fused_grid,
    )

    bm, bp, tm, tp, blat, blon, obs = _setup(nobs=9, nmems=12, seed=14)
    nrows = bm.shape[0]
    ngrid = 64  # 2 times x (8x8 grid): rows = (vt=2, g=64)
    assert nrows == 2 * ngrid
    body_vert = None
    if vertical:
        body_vert = jnp.asarray(np.repeat([500.0, 850.0], ngrid), dtype=bp.dtype)
        rng = np.random.default_rng(1)
        obs = obs._replace(
            verts=jnp.asarray(rng.uniform(400, 900, obs.values.shape[0]),
                              dtype=bp.dtype),
            vert_radii=jnp.asarray(
                np.where(np.arange(obs.values.shape[0]) % 2 == 0, np.inf, 300.0),
                dtype=bp.dtype),
        )
    tail = core.tail_scan(tm, tp, obs, localize=True)
    flat = ensrf_blocked_body_pallas_fused(
        bm, bp, blat, blon, tail, obs, body_vert=body_vert,
        localize=True, block_size=3, tile=48, interpret=True,
        vertical=vertical,
    )
    grid = ensrf_blocked_body_pallas_fused_grid(
        bm, bp, blat, blon, tail, obs, body_vert=body_vert,
        localize=True, block_size=3, tile=48, interpret=True,
        vertical=vertical, ngrid=ngrid,
    )
    np.testing.assert_allclose(np.asarray(grid[0]), np.asarray(flat[0]),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(grid[1]), np.asarray(flat[1]),
                               rtol=2e-5, atol=2e-4)


def test_ensrf_class_routes_gridded_fast_geometry_to_v4_grid():
    """EnSRF with use_pallas + fast_geometry on a vt>1 state must agree
    with the XLA path (exercises the v4-grid routing end to end)."""
    from conftest import make_demo_obs, make_demo_state
    from efa_xray_tpu.assimilation.ensrf import EnSRF
    from efa_xray_tpu.config import FilterConfig

    state = make_demo_state(ntimes=3, ny=7, nx=9, nmems=14, seed=15)
    obs = make_demo_obs(state, nobs=7, seed=16, radius=900.0)
    base = FilterConfig(localization="GC", dtype="float32", use_pallas=False,
                        fast_geometry=True)
    fused = FilterConfig(localization="GC", dtype="float32", use_pallas=True,
                         fast_geometry=True, block_size=3, pallas_tile=32)
    p1, _ = EnSRF(state, list(obs), config=base).update()
    p2, _ = EnSRF(state, list(obs), config=fused).update()
    np.testing.assert_allclose(np.asarray(p2.data), np.asarray(p1.data),
                               atol=2e-4)
