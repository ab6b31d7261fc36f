"""EnsembleState container: construction, accessors, (de)vectorization,
statistics, geometry, and I/O round-trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import make_demo_state
from efa_xray_tpu.state.ensemble import EnsembleState
from efa_xray_tpu.state.structure import StateStructure


def test_accessors_match_construction():
    state = make_demo_state(nvars=2, ntimes=3, ny=4, nx=5, nmems=7)
    assert state.nvars() == 2
    assert state.ntimes() == 3
    assert state.ny() == 4
    assert state.nx() == 5
    assert state.nmems() == 7
    assert state.nstate() == 2 * 3 * 4 * 5
    assert state.shape() == (2, 3, 4, 5, 7)
    assert len(state.vars()) == 2


def test_to_vect_row_ordering_matches_reference_contract():
    """Flattened rows must iterate (var, time, y, x) C-order with members
    last (reference efa_xray/state/ensemble.py:110-114)."""
    state = make_demo_state(nvars=2, ntimes=2, ny=3, nx=4, nmems=5)
    vect = np.asarray(state.to_vect())
    dense = np.asarray(state.data)
    s = state.structure
    # spot-check a handful of rows against explicit indexing
    for (v, t, y, x) in [(0, 0, 0, 0), (1, 0, 2, 3), (0, 1, 1, 2), (1, 1, 2, 0)]:
        row = s.flat_index(v, t, y, x)
        np.testing.assert_array_equal(vect[row], dense[v, t, y, x])


def test_vect_roundtrip():
    state = make_demo_state()
    back = EnsembleState.from_vect(state.to_vect(), state.structure)
    np.testing.assert_allclose(np.asarray(back.data), np.asarray(state.data))


def test_ensemble_mean_and_perts():
    state = make_demo_state(nmems=10)
    mean = np.asarray(state.ensemble_mean())
    perts = np.asarray(state.ensemble_perts().data)
    np.testing.assert_allclose(np.asarray(state.data), perts + mean[..., None])
    np.testing.assert_allclose(perts.mean(axis=-1), 0.0, atol=1e-10)


def test_ensemble_times_roundtrip():
    state = make_demo_state(ntimes=4)
    times = state.ensemble_times()
    assert times.dtype.kind == "M"
    assert len(times) == 4
    assert (np.diff(times) == np.timedelta64(6, "h")).all()


def test_getitem_variable_block():
    state = make_demo_state(nvars=2)
    blk = np.asarray(state[state.vars()[1]])
    np.testing.assert_array_equal(blk, np.asarray(state.data)[1])
    with pytest.raises(KeyError):
        state["nonexistent"]


def test_pytree_roundtrip_through_jit():
    state = make_demo_state(ny=3, nx=3, nmems=4)

    @jax.jit
    def double(s: EnsembleState) -> EnsembleState:
        return s.replace_data(s.data * 2.0)

    out = double(state)
    assert isinstance(out, EnsembleState)
    np.testing.assert_allclose(np.asarray(out.data), 2 * np.asarray(state.data))
    assert out.structure == state.structure


def test_distance_to_point_matches_haversine():
    state = make_demo_state()
    d = np.asarray(state.distance_to_point(45.0, 235.0))
    assert d.shape == (state.ny(), state.nx())
    assert d.min() >= 0


def test_nearest_points_finds_true_nearest():
    state = make_demo_state(ny=10, nx=12)
    s = state.structure
    y0, x0 = 4, 7
    yy, xx = state.nearest_points(float(s.lat[y0, x0]), float(s.lon[y0, x0]), npt=1)
    assert (int(yy[0]), int(xx[0])) == (y0, x0)


def test_netcdf_roundtrip(tmp_path):
    state = make_demo_state(nvars=2, ntimes=2, ny=3, nx=4, nmems=5)
    path = str(tmp_path / "state.nc")
    state.save_to_disk(path)
    back = EnsembleState.from_netcdf(path)
    assert back.structure == state.structure
    np.testing.assert_allclose(
        np.asarray(back.data), np.asarray(state.data), rtol=1e-12
    )


def test_1d_location_grid():
    """1-D location lists (the reference's broken branch,
    ensemble.py:186-188) are supported via an (nloc, 1) internal grid."""
    nloc, ntimes, nmems = 7, 3, 5
    rng = np.random.default_rng(0)
    lats = np.linspace(-10, 10, nloc)
    lons = np.linspace(100, 120, nloc)
    times = np.datetime64("2026-08-01") + np.arange(ntimes) * np.timedelta64(6, "h")
    data = rng.normal(280, 3, (ntimes, nloc, nmems))
    state = EnsembleState.from_vardict(
        {"T2m": data},
        {"validtime": times, "lat": lats, "lon": lons, "mem": np.arange(nmems)},
    )
    assert state.ny() == nloc and state.nx() == 1
    assert not state.structure.grid_is_2d
    est = state.interpolate("T2m", times[1], float(lats[2]), float(lons[2]))
    # Exact grid-point + exact time -> identity pick of that location's members
    np.testing.assert_allclose(np.asarray(est), data[1, 2, :], rtol=1e-12)


def test_from_vardict_xarray_style_dims_tuples():
    """(dims, array) coord tuples with a string dims name — the common
    xarray form, e.g. lat=("location", arr) — must unwrap, and so must
    tuple-of-names dims like (("y", "x"), arr)."""
    nloc, ntimes, nmems = 5, 2, 4
    rng = np.random.default_rng(1)
    lats = np.linspace(-5, 5, nloc)
    lons = np.linspace(100, 110, nloc)
    times = np.datetime64("2026-08-01") + np.arange(ntimes) * np.timedelta64(6, "h")
    data = rng.normal(280, 3, (ntimes, nloc, nmems))
    state = EnsembleState.from_vardict(
        {"T2m": (("validtime", "location", "mem"), data)},
        {
            "validtime": times,
            "lat": ("location", lats),
            "lon": (("location",), lons),
            "mem": np.arange(nmems),
        },
    )
    assert state.ny() == nloc
    np.testing.assert_allclose(state.structure.lat.ravel(), lats)
    np.testing.assert_allclose(np.asarray(state.data)[0, :, :, 0, :], data)


def test_structure_row_latlon_tiling():
    s = StateStructure.build(
        ["a", "b"],
        np.datetime64("2026-08-01") + np.arange(2) * np.timedelta64(1, "h"),
        np.array([[10.0, 20.0]]),
        np.array([[30.0, 40.0]]),
        nmems=3,
    )
    rlat, rlon = s.row_latlon()
    assert rlat.shape == (s.nstate,)
    np.testing.assert_array_equal(rlat, np.tile([10.0, 20.0], 4))
    np.testing.assert_array_equal(rlon, np.tile([30.0, 40.0], 4))


def test_xarray_shim_gated():
    """xarray is absent in this image: the shims must raise a clear
    ImportError (and work when xarray exists — covered in environments
    that have it)."""
    import importlib.util

    from efa_xray_tpu.utils import xarray_shim

    state = make_demo_state(ny=3, nx=3, nmems=4)
    if importlib.util.find_spec("xarray") is None:
        with pytest.raises(ImportError, match="xarray"):
            xarray_shim.to_xarray(state)
    else:  # pragma: no cover - xarray present
        ds = xarray_shim.to_xarray(state)
        back = xarray_shim.from_xarray(ds)
        np.testing.assert_allclose(np.asarray(back.data), np.asarray(state.data))


# ---------------------------------------------------------------------------
# sel/isel subsetting (the xarray .sel/.isel analog the reference inherits)
# ---------------------------------------------------------------------------


def test_isel_positions_and_metadata():
    state = make_demo_state(nvars=2, ntimes=3, ny=6, nx=8, nmems=10)
    sub = state.isel(vars=1, validtime=slice(1, 3), y=[0, 2, 4],
                     x=np.arange(4), mem=slice(0, 5))
    assert sub.shape() == (1, 2, 3, 4, 5)
    s, ss = state.structure, sub.structure
    assert ss.var_names == (s.var_names[1],)
    np.testing.assert_array_equal(ss.times_s, s.times_s[1:3])
    np.testing.assert_array_equal(ss.lat, s.lat[np.ix_([0, 2, 4], range(4))])
    np.testing.assert_array_equal(
        np.asarray(sub.data),
        np.asarray(state.data)[1:2, 1:3][:, :, [0, 2, 4]][:, :, :, :4, :5],
    )


def test_isel_vars_by_name_and_bool_mask():
    state = make_demo_state(nvars=3, nmems=6)
    names = state.vars()
    sub = state.isel(vars=[names[2], names[0]])
    assert sub.vars() == [names[2], names[0]]
    np.testing.assert_array_equal(
        np.asarray(sub.data), np.asarray(state.data)[[2, 0]]
    )
    mask = np.array([True, False, True])
    sub2 = state.isel(vars=mask)
    assert sub2.vars() == [names[0], names[2]]


def test_isel_scalar_keeps_dims_and_validates():
    state = make_demo_state(ntimes=3, nmems=6)
    sub = state.isel(validtime=1)
    assert sub.shape()[1] == 1  # scalar keeps the dim at size 1
    with pytest.raises(IndexError):
        state.isel(validtime=7)
    with pytest.raises(IndexError):
        state.isel(y=np.array([], dtype=int))


def test_sel_time_nearest_exact_and_window():
    state = make_demo_state(ntimes=4)
    t = state.ensemble_times()
    sub = state.sel(validtime=t[2])
    np.testing.assert_array_equal(sub.ensemble_times(), t[2:3])
    # nearest: 1 hour past t[1] still picks t[1]
    near = state.sel(validtime=t[1] + np.timedelta64(1, "h"))
    np.testing.assert_array_equal(near.ensemble_times(), t[1:2])
    with pytest.raises(KeyError):
        state.sel(validtime=t[1] + np.timedelta64(1, "h"), method="exact")
    win = state.sel(validtime=slice(t[1], t[2]))
    np.testing.assert_array_equal(win.ensemble_times(), t[1:3])
    open_end = state.sel(validtime=slice(t[2], None))
    np.testing.assert_array_equal(open_end.ensemble_times(), t[2:])
    with pytest.raises(KeyError):
        state.sel(validtime=slice(t[-1] + np.timedelta64(1, "D"), None))


def test_sel_latlon_box_and_scalars():
    state = make_demo_state(ny=6, nx=8)
    s = state.structure
    box = state.sel(lat=slice(44.0, 48.0), lon=slice(233.0, 240.0))
    bs = box.structure
    assert (bs.lat >= 44.0).all() and (bs.lat <= 48.0).all()
    assert (bs.lon >= 233.0).all() and (bs.lon <= 240.0).all()
    assert bs.ny < s.ny and bs.nx < s.nx
    # data follows the same rectangle
    y_idx = np.flatnonzero((s.lat[:, 0] >= 44.0) & (s.lat[:, 0] <= 48.0))
    x_idx = np.flatnonzero((s.lon[0] >= 233.0) & (s.lon[0] <= 240.0))
    np.testing.assert_array_equal(
        np.asarray(box.data),
        np.asarray(state.data)[:, :, y_idx][:, :, :, x_idx],
    )
    # scalar lat/lon pick the nearest row/column
    row = state.sel(lat=45.7)
    assert row.structure.ny == 1
    assert abs(row.structure.lat[0, 0] - 45.7) == pytest.approx(
        np.abs(s.lat[:, 0] - 45.7).min()
    )
    col = state.sel(lon=236.9)
    assert col.structure.nx == 1
    with pytest.raises(KeyError):
        state.sel(lat=slice(80.0, 85.0))


def test_sel_lon_wraps_dateline():
    """slice(lo, hi) with lo > hi wraps through 0/360."""
    ny, nx, nmems = 4, 12, 5
    lat1d = np.linspace(-30, 30, ny)
    lon1d = np.arange(0, 360, 30.0)
    lon, lat = np.meshgrid(lon1d, lat1d)
    times = np.datetime64("2026-08-01T00") + np.arange(1) * np.timedelta64(6, "h")
    rng = np.random.default_rng(0)
    state = EnsembleState.from_vardict(
        {"T2m": rng.normal(280, 5, (1, ny, nx, nmems))},
        {"validtime": times, "lat": lat, "lon": lon, "mem": np.arange(nmems)},
    )
    sub = state.sel(lon=slice(300.0, 60.0))
    got = np.mod(sub.structure.lon[0], 360.0)
    assert set(got.tolist()) == {300.0, 330.0, 0.0, 30.0, 60.0}


def test_sel_subset_netcdf_roundtrip(tmp_path):
    """A sel() subset (with attrs + extra coords) survives a netCDF
    round-trip — the verdict's done-criterion for the subsetting API."""
    rng = np.random.default_rng(3)
    ny, nx, ntimes, nmems = 6, 8, 3, 5
    lat1d = np.linspace(42.0, 50.0, ny)
    lon1d = np.linspace(230.0, 244.0, nx)
    lon, lat = np.meshgrid(lon1d, lat1d)
    times = np.datetime64("2026-08-01T00") + np.arange(ntimes) * np.timedelta64(6, "h")
    state = EnsembleState.from_vardict(
        {"T2m": rng.normal(280, 5, (ntimes, ny, nx, nmems)),
         "PSFC": rng.normal(1000, 5, (ntimes, ny, nx, nmems))},
        {"validtime": times, "lat": lat, "lon": lon, "mem": np.arange(nmems),
         "orog": (("y", "x"), rng.normal(500, 100, (ny, nx)))},
        attrs={"title": "subset-roundtrip"},
        var_attrs={"T2m": {"units": "K"}, "PSFC": {"units": "hPa"}},
    )
    sub = state.sel(vars="T2m", validtime=slice(times[1], None),
                    lat=slice(44.0, 48.0))
    path = str(tmp_path / "subset.nc")
    sub.save_to_disk(path)
    back = EnsembleState.from_netcdf(path)
    np.testing.assert_allclose(np.asarray(back.data), np.asarray(sub.data))
    assert back.vars() == ["T2m"]
    assert back.attrs["title"] == "subset-roundtrip"
    assert back.var_attrs["T2m"]["units"] == "K"
    dims, arr, _ = back.extra_coords["orog"]
    # the extra coord was subset along its y axis with the selection
    sdims, sarr, _ = sub.extra_coords["orog"]
    np.testing.assert_allclose(arr, sarr)
    assert arr.shape == (sub.structure.ny, sub.structure.nx)
    np.testing.assert_array_equal(back.ensemble_times(), sub.ensemble_times())


def test_sel_subset_assimilates():
    """A subset state is a fully functional EnsembleState: EnSRF over the
    sub-region equals EnSRF over the full state restricted to it when the
    obs and localization stay inside the box."""
    from conftest import make_demo_obs
    from efa_xray_tpu.assimilation.ensrf import EnSRF
    from efa_xray_tpu.config import FilterConfig

    state = make_demo_state(ny=6, nx=8, nmems=12)
    sub = state.sel(validtime=slice(state.ensemble_times()[1], None))
    obs = make_demo_obs(sub, nobs=4, radius=1500.0)
    cfg = FilterConfig(localization="GC", dtype="float64")
    post, batch = EnSRF(sub, list(obs), config=cfg, verbose=False).update()
    assert post.shape() == sub.shape()
    assert batch.assimilated.all()


def test_arithmetic_state_state_and_scalar():
    """Dataset-arithmetic analog: state-state and state-scalar elementwise
    ops with metadata carried (reference gets these from xarray.Dataset
    inheritance, efa_xray/state/ensemble.py:15)."""
    a = make_demo_state(nvars=2, ntimes=2, ny=3, nx=4, nmems=5, seed=0)
    b = make_demo_state(nvars=2, ntimes=2, ny=3, nx=4, nmems=5, seed=1)
    inc = b - a
    assert isinstance(inc, EnsembleState)
    np.testing.assert_allclose(np.asarray(inc.data),
                               np.asarray(b.data) - np.asarray(a.data))
    assert inc.structure is b.structure  # left structure carried

    np.testing.assert_allclose(np.asarray((a + b).data),
                               np.asarray(a.data) + np.asarray(b.data))
    np.testing.assert_allclose(np.asarray((a * 2.0).data),
                               2.0 * np.asarray(a.data))
    np.testing.assert_allclose(np.asarray((3.0 * a).data),
                               3.0 * np.asarray(a.data))
    np.testing.assert_allclose(np.asarray((1.0 + a).data),
                               1.0 + np.asarray(a.data))
    shifted = a + 10.0  # keep positive for division/pow cases
    np.testing.assert_allclose(np.asarray((1.0 / shifted).data),
                               1.0 / np.asarray(shifted.data))
    np.testing.assert_allclose(np.asarray((shifted / 2.0).data),
                               np.asarray(shifted.data) / 2.0)
    np.testing.assert_allclose(np.asarray((shifted ** 2).data),
                               np.asarray(shifted.data) ** 2)
    np.testing.assert_allclose(np.asarray((-a).data), -np.asarray(a.data))
    np.testing.assert_allclose(np.asarray(abs(a).data),
                               np.abs(np.asarray(a.data)))
    np.testing.assert_allclose(np.asarray((2.0 - a).data),
                               2.0 - np.asarray(a.data))


def test_arithmetic_broadcast_array_and_mismatch():
    a = make_demo_state(nvars=2, ntimes=2, ny=3, nx=4, nmems=5, seed=0)
    # per-member weights broadcast over [V,T,Y,X,M]
    w = np.linspace(0.5, 1.5, 5)
    np.testing.assert_allclose(np.asarray((a * w).data),
                               np.asarray(a.data) * w)
    small = make_demo_state(nvars=2, ntimes=2, ny=3, nx=4, nmems=3, seed=0)
    with pytest.raises(ValueError, match="mismatch"):
        _ = a + small


def test_arithmetic_matches_perts_inflation_idiom():
    """mean + perts*factor written with operators equals the dedicated
    inflation path's algebra."""
    a = make_demo_state(nvars=1, ntimes=2, ny=3, nx=4, nmems=6, seed=2)
    mean = a.ensemble_mean()[..., None]
    inflated = (a - a.replace_data(jnp.broadcast_to(mean, a.data.shape))) \
        * 1.3 + mean
    ref = (np.asarray(a.data) - np.asarray(mean)) * 1.3 + np.asarray(mean)
    np.testing.assert_allclose(np.asarray(inflated.data), ref, rtol=1e-12)


def test_where_masks_like_dataset_where():
    a = make_demo_state(nvars=1, ntimes=2, ny=3, nx=4, nmems=5, seed=0)
    arr = np.asarray(a.data)
    cond = arr > arr.mean()
    masked = a.where(cond)
    got = np.asarray(masked.data)
    np.testing.assert_allclose(got[cond], arr[cond])
    assert np.isnan(got[~cond]).all()
    filled = a.where(cond, -1.0)
    assert (np.asarray(filled.data)[~cond] == -1.0).all()
    # EnsembleState operands for both mask and fill
    b = make_demo_state(nvars=1, ntimes=2, ny=3, nx=4, nmems=5, seed=1)
    swapped = a.where(a.replace_data(jnp.asarray(cond)), b)
    np.testing.assert_allclose(np.asarray(swapped.data)[~cond],
                               np.asarray(b.data)[~cond])


def test_arithmetic_reflected_pow_and_numpy_left_operand():
    """``2.0 ** state`` and ``np_array * state`` must dispatch to the
    reflected EnsembleState ops (``__array_ufunc__ = None`` makes numpy
    defer) instead of numpy consuming the state elementwise."""
    a = make_demo_state(nvars=1, ntimes=2, ny=3, nx=4, nmems=5, seed=0)
    small = (a - a) + 1.5  # well-conditioned base/exponent
    r = 2.0 ** small
    assert isinstance(r, EnsembleState)
    np.testing.assert_allclose(np.asarray(r.data),
                               2.0 ** np.asarray(small.data))
    w = np.linspace(0.5, 1.5, 5)  # numpy array on the LEFT
    left = w * a
    assert isinstance(left, EnsembleState)
    np.testing.assert_allclose(np.asarray(left.data), np.asarray(a.data) * w)
    lsub = w - small
    assert isinstance(lsub, EnsembleState)
    np.testing.assert_allclose(np.asarray(lsub.data),
                               w - np.asarray(small.data))


def test_arithmetic_coordinate_mismatch_raises():
    """Same shape but different validtimes/grid must refuse (no silent
    left-metadata combine; xarray would align on coordinates)."""
    a = make_demo_state(nvars=1, ntimes=2, ny=3, nx=4, nmems=5, seed=0)
    b = make_demo_state(nvars=1, ntimes=2, ny=3, nx=4, nmems=5, seed=1)
    _ = a + b  # identical coords: fine
    import dataclasses
    shifted_struct = dataclasses.replace(
        b.structure, times_s=np.asarray(b.structure.times_s) + 3600
    )
    c = EnsembleState(b.data, shifted_struct)
    with pytest.raises(ValueError, match="coordinate mismatch"):
        _ = a + c
    with pytest.raises(ValueError, match="coordinate mismatch"):
        _ = a.where(a.replace_data(jnp.asarray(a.data > 0)), c)
