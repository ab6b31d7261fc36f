"""Metadata faithfulness: attrs, per-variable attrs and extra coordinate
variables survive construction, assimilation updates, and netCDF
round-trips.

Parity target: the reference state IS an ``xarray.Dataset``
(``efa_xray/state/ensemble.py:15``), so arbitrary attrs and extra coords
ride along for free there; a user migrating a real GEFS Dataset must not
lose units/metadata silently here.
"""

import numpy as np
import pytest

from conftest import make_demo_obs, make_demo_state
from efa_xray_tpu.state.ensemble import EnsembleState


def _rich_state(ny=6, nx=8, ntimes=2, nmems=8, seed=0):
    rng = np.random.default_rng(seed)
    lat1 = np.linspace(40, 50, ny)
    lon1 = np.linspace(230, 245, nx)
    lon, lat = np.meshgrid(lon1, lat1)
    times = np.datetime64("2026-08-01T00") + np.arange(ntimes) * np.timedelta64(6, "h")
    field = (280 + rng.normal(0, 2, (ntimes, ny, nx, nmems))).astype(np.float32)
    fhour = np.arange(ntimes) * 6.0
    state = EnsembleState.from_vardict(
        {"T2M": field},
        {
            "validtime": times,
            "lat": lat,
            "lon": lon,
            "mem": np.arange(nmems),
            # extra coordinate variables, xarray (dims, array) style
            "fhour": (("validtime",), fhour),
            "level": ((), np.float64(2.0)),
        },
        attrs={"title": "GEFS-like demo", "institution": "test-suite"},
        var_attrs={"T2M": {"units": "K", "long_name": "2-m temperature"}},
    )
    return state


def test_from_vardict_carries_metadata():
    state = _rich_state()
    assert state.attrs["title"] == "GEFS-like demo"
    assert state.var_attrs["T2M"]["units"] == "K"
    assert "fhour" in state.extra_coords
    dims, arr, _ = state.extra_coords["fhour"]
    assert dims == ("validtime",)
    np.testing.assert_allclose(arr, [0.0, 6.0])


def test_metadata_survives_assimilation_update():
    from efa_xray_tpu.assimilation.ensrf import EnSRF

    state = _rich_state()
    obs = make_demo_obs(make_demo_state(ny=6, nx=8, ntimes=2, nmems=8),
                        nobs=3, radius=1500.0)
    # re-point obs at this state's variable name/coords
    s = state.structure
    for i, ob in enumerate(obs):
        ob.obtype = "T2M"
        ob.lat = float(s.lat[1 + i, 2])
        ob.lon = float(s.lon[1 + i, 2])
        ob.time = s.times64()[0]
    post, _ = EnSRF(state, obs, verbose=False, loc="GC").update()
    assert post.attrs["title"] == "GEFS-like demo"
    assert post.var_attrs["T2M"]["units"] == "K"
    assert "fhour" in post.extra_coords


def test_netcdf_roundtrip_preserves_metadata(tmp_path):
    state = _rich_state()
    path = str(tmp_path / "meta_state.nc")
    state.save_to_disk(path)
    back = EnsembleState.from_netcdf(path)
    np.testing.assert_allclose(
        np.asarray(back.data), np.asarray(state.data), rtol=1e-6
    )
    assert back.attrs["title"] == "GEFS-like demo"
    assert back.attrs["institution"] == "test-suite"
    assert back.var_attrs["T2M"]["units"] == "K"
    assert back.var_attrs["T2M"]["long_name"] == "2-m temperature"
    dims, arr, _ = back.extra_coords["fhour"]
    assert tuple(dims) == ("validtime",)
    np.testing.assert_allclose(np.asarray(arr), [0.0, 6.0])
    # structure equality ignores metadata (jit-cache invariant)
    assert back.structure == state.structure
    assert hash(back.structure) == hash(state.structure)


def test_1d_location_grid_roundtrip(tmp_path):
    """1-D location-list states persist with an honest ``location``
    dimension and round-trip exactly (the reference's 1-D branch is its
    broken path, ``efa_xray/state/ensemble.py:186-188``)."""
    rng = np.random.default_rng(3)
    nloc, ntimes, nmems = 7, 3, 5
    times = np.datetime64("2026-08-01T00") + np.arange(ntimes) * np.timedelta64(6, "h")
    field = rng.normal(280, 2, (ntimes, nloc, nmems))
    state = EnsembleState.from_vardict(
        {"T2M": field},
        {
            "validtime": times,
            "lat": np.linspace(40, 50, nloc),
            "lon": np.linspace(230, 240, nloc),
            "mem": np.arange(nmems),
            "station_elev": (("location",), np.linspace(0, 700, nloc)),
        },
        attrs={"network": "mesonet"},
        var_attrs={"T2M": {"units": "K"}},
    )
    path = str(tmp_path / "points.nc")
    state.save_to_disk(path)

    # the file uses a location dim, not a fake 2-D raster
    from efa_xray_tpu.utils import ncio

    ds = ncio.read_dataset(path)
    assert ds.var_dims("T2M") == ("validtime", "location", "mem")
    assert ds.var_dims("lat") == ("location",)

    back = EnsembleState.from_netcdf(path)
    assert not back.structure.grid_is_2d
    np.testing.assert_allclose(
        np.asarray(back.data), np.asarray(state.data), rtol=1e-6
    )
    np.testing.assert_allclose(
        back.structure.lat.reshape(-1), state.structure.lat.reshape(-1)
    )
    assert back.attrs["network"] == "mesonet"
    assert back.var_attrs["T2M"]["units"] == "K"
    dims, arr, _ = back.extra_coords["station_elev"]
    np.testing.assert_allclose(np.asarray(arr), np.linspace(0, 700, nloc))


def test_plain_state_roundtrip_still_clean(tmp_path):
    """States without metadata keep a None meta (no empty-dict noise) and
    round-trip as before."""
    state = make_demo_state(ny=5, nx=5, ntimes=2, nmems=6)
    assert state.structure.meta is None
    path = str(tmp_path / "plain.nc")
    state.save_to_disk(path)
    back = EnsembleState.from_netcdf(path)
    np.testing.assert_allclose(
        np.asarray(back.data), np.asarray(state.data), rtol=1e-6
    )
    assert back.attrs == {}
    assert back.extra_coords == {}


def test_reserved_bookkeeping_attrs_not_clobbered(tmp_path):
    """A foreign Dataset whose global attrs collide with the writer's
    bookkeeping keys (var_order / grid_is_2d / extra_coords) must not
    corrupt the read-back (r3 review: user attrs used to be applied after
    the computed bookkeeping attrs and clobbered them)."""
    state = _rich_state()
    state.structure.meta.attrs["var_order"] = "BOGUS,NAMES"
    state.structure.meta.attrs["grid_is_2d"] = np.int8(0)
    state.structure.meta.attrs["extra_coords"] = "nope"
    path = str(tmp_path / "collide.nc")
    state.save_to_disk(path)
    back = EnsembleState.from_netcdf(path)
    assert back.structure.var_names == state.structure.var_names
    assert back.structure.grid_is_2d == state.structure.grid_is_2d
    assert "fhour" in back.extra_coords
    np.testing.assert_allclose(
        np.asarray(back.data), np.asarray(state.data), rtol=1e-6
    )
