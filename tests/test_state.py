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
