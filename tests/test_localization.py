"""Unit tests for Gaspari-Cohn and great-circle geometry."""

import numpy as np
import pytest

from efa_xray_tpu.observation.localization import (
    distance_to_point,
    gaspari_cohn,
    gaspari_cohn_np,
    haversine,
    localization_weights,
    pairwise_distance,
)


def gc_reference_poly(r):
    """Direct evaluation of Gaspari & Cohn (1999) eq 4.10 for scalar r."""
    if r <= 1.0:
        return (
            -0.25 * r**5 + 0.5 * r**4 + 0.625 * r**3 - (5.0 / 3.0) * r**2 + 1.0
        )
    if r < 2.0:
        return (
            r**5 / 12.0
            - 0.5 * r**4
            + 0.625 * r**3
            + (5.0 / 3.0) * r**2
            - 5.0 * r
            + 4.0
            - 2.0 / (3.0 * r)
        )
    return 0.0


def test_gaspari_cohn_matches_published_polynomial():
    halfwidth = 1000.0
    dists = np.linspace(0.0, 2500.0, 101)
    got = np.asarray(gaspari_cohn(dists, halfwidth))
    want = np.array([gc_reference_poly(d / halfwidth) for d in dists])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_gaspari_cohn_boundary_values():
    assert float(gaspari_cohn(0.0, 100.0)) == pytest.approx(1.0)
    # At r=1 both branches agree: value = 1 - 5/3 + 0.625 + 0.5 - 0.25
    assert float(gaspari_cohn(100.0, 100.0)) == pytest.approx(
        gc_reference_poly(1.0), abs=1e-12
    )
    # Compact support: zero at and beyond 2*halfwidth
    assert float(gaspari_cohn(200.0, 100.0)) == pytest.approx(0.0, abs=1e-12)
    assert float(gaspari_cohn(1e6, 100.0)) == 0.0


def test_gaspari_cohn_negative_halfwidth_uses_abs():
    # reference divides by abs(halfwidth) (observation.py:120)
    np.testing.assert_allclose(
        np.asarray(gaspari_cohn(50.0, -100.0)), np.asarray(gaspari_cohn(50.0, 100.0))
    )


def test_gaspari_cohn_infinite_halfwidth_is_identity():
    d = np.array([0.0, 100.0, 1e7])
    np.testing.assert_allclose(np.asarray(gaspari_cohn(d, np.inf)), 1.0)


def test_gaspari_cohn_np_matches_jax():
    d = np.linspace(0, 300, 57)
    np.testing.assert_allclose(
        gaspari_cohn_np(d, 80.0), np.asarray(gaspari_cohn(d, 80.0)), atol=1e-12
    )


def test_haversine_known_city_pairs():
    # Seattle <-> Portland ~= 234 km; London <-> Paris ~= 344 km
    sea = (47.6062, -122.3321)
    pdx = (45.5152, -122.6784)
    assert float(haversine(sea, pdx)) == pytest.approx(234.0, abs=3.0)
    lon_ = (51.5074, -0.1278)
    par = (48.8566, 2.3522)
    assert float(haversine(lon_, par)) == pytest.approx(344.0, abs=3.0)


def test_haversine_zero_and_antipode():
    assert float(haversine((10.0, 20.0), (10.0, 20.0))) == pytest.approx(0.0, abs=1e-9)
    half_circumference = np.pi * 6371.0
    assert float(haversine((0.0, 0.0), (0.0, 180.0))) == pytest.approx(
        half_circumference, rel=1e-6
    )


def test_haversine_longitude_wrap_equivalence():
    # 350E == -10E
    d1 = float(haversine((0.0, 350.0), (0.0, 0.0)))
    d2 = float(haversine((0.0, -10.0), (0.0, 0.0)))
    assert d1 == pytest.approx(d2, rel=1e-9)


def test_distance_to_point_field_shape_and_values():
    lat = np.array([[0.0, 0.0], [1.0, 1.0]])
    lon = np.array([[0.0, 1.0], [0.0, 1.0]])
    d = np.asarray(distance_to_point(lat, lon, 0.0, 0.0))
    assert d.shape == (2, 2)
    assert d[0, 0] == pytest.approx(0.0, abs=1e-9)
    # one degree of latitude ~= 111.2 km
    assert d[1, 0] == pytest.approx(111.2, abs=0.5)


def test_pairwise_distance_matrix():
    lats1, lons1 = np.array([0.0, 10.0]), np.array([0.0, 10.0])
    lats2, lons2 = np.array([0.0]), np.array([0.0])
    d = np.asarray(pairwise_distance(lats1, lons1, lats2, lons2))
    assert d.shape == (2, 1)
    assert d[0, 0] == pytest.approx(0.0, abs=1e-9)


def test_localization_weights_compact_support():
    lat = np.zeros((1, 100))
    lon = np.linspace(0, 99, 100)[None, :]
    w = np.asarray(localization_weights(lat, lon, 0.0, 0.0, 500.0))
    assert w[0, 0] == pytest.approx(1.0)
    assert (np.diff(w[0]) <= 1e-12).all()  # monotone decreasing along the ray
    far = np.asarray(localization_weights(lat, lon, 0.0, 0.0, 100.0))
    assert far[0, -1] == 0.0


def test_chordal_weights_match_haversine_gc():
    """Fast chordal geometry (unit-vector dot + polynomial arccos) must
    reproduce haversine Gaspari-Cohn weights to ~1e-6."""
    from efa_xray_tpu.observation.localization import (
        chordal_gc_weights,
        latlon_to_unit,
    )

    rng = np.random.default_rng(0)
    lats = rng.uniform(-89, 89, 500)
    lons = rng.uniform(0, 360, 500)
    ob = (12.3, 245.6)
    want = np.asarray(
        gaspari_cohn(haversine((lats, lons), ob), 1500.0)
    )
    got = np.asarray(
        chordal_gc_weights(
            latlon_to_unit(lats, lons), latlon_to_unit(*ob), 1500.0
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-6)
    # infinite radius -> ones
    ones = np.asarray(
        chordal_gc_weights(latlon_to_unit(lats, lons), latlon_to_unit(*ob), np.inf)
    )
    np.testing.assert_allclose(ones, 1.0)


def test_arccos_polynomial_accuracy():
    from efa_xray_tpu.observation.localization import _arccos_as

    t = np.linspace(-1, 1, 20001)
    got = np.asarray(_arccos_as(np.asarray(t)))
    np.testing.assert_allclose(got, np.arccos(t), atol=3e-8)


def test_map_localization_plot():
    """O4: the localization footprint plot (reference observation.py:94-115,
    which required Basemap) renders headless, peaks at the ob location, and
    honors a projection callable."""
    import matplotlib

    matplotlib.use("Agg")
    from conftest import make_demo_state
    from efa_xray_tpu.observation.observation import Observation

    state = make_demo_state(ny=8, nx=10)
    s = state.structure
    ob = Observation(value=1.0, obtype=s.var_names[0], time=s.times64()[0],
                     error=1.0, lat=float(s.lat[4, 5]), lon=float(s.lon[4, 5]),
                     localize_radius=300.0, description="footprint")
    ax = ob.map_localization(state)
    quads = ax.collections[0].get_array()
    w = np.asarray(quads).reshape(-1)
    assert w.max() > 0.99  # weight ~1 at the ob's own grid point
    assert w.min() == 0.0  # compact support reaches zero on this domain

    proj = lambda lon, lat: (lon * 2.0, lat * 2.0)  # any callable projection
    ax2 = ob.map_localization(state, projection=proj)
    assert ax2 is not ax


def test_hilbert_keys_jnp_matches_numpy_twin():
    """Device hilbert3d_keys == host _hilbert3d_np (float64)."""
    import jax
    import jax.numpy as jnp
    from efa_xray_tpu.observation.localization import (
        hilbert3d_keys, latlon_to_unit)
    from efa_xray_tpu.observation.thinning import _hilbert3d_np

    rng = np.random.default_rng(7)
    lat = rng.uniform(-90, 90, 4096)
    lon = rng.uniform(0, 360, 4096)
    host = _hilbert3d_np(lat, lon)
    dev = np.asarray(hilbert3d_keys(latlon_to_unit(
        jnp.asarray(lat, jnp.float64), jnp.asarray(lon, jnp.float64))))
    np.testing.assert_array_equal(host, dev)


def test_hilbert_order_tiles_more_compact_than_morton():
    """The Hilbert curve's jump-free adjacency must give contiguous tiles
    caps no wider (on average) than Morton's — the property the fused
    kernel's culling exploits."""
    import jax.numpy as jnp
    from efa_xray_tpu.observation.localization import latlon_to_unit
    from efa_xray_tpu.observation.thinning import (
        _hilbert3d_np, _morton3d_np)

    rng = np.random.default_rng(3)
    n, tile = 1 << 15, 512
    lat = rng.uniform(-88, 88, n)
    lon = rng.uniform(0, 360, n)

    def mean_cap(order):
        xyz = np.asarray(latlon_to_unit(jnp.asarray(lat[order]),
                                        jnp.asarray(lon[order])))
        t = xyz.reshape(n // tile, tile, 3)
        c = t.sum(axis=1)
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        cosmin = np.einsum("gtc,gc->gt", t, c).min(axis=1)
        return np.arccos(np.clip(cosmin, -1, 1)).mean()

    cap_m = mean_cap(np.argsort(_morton3d_np(lat, lon), kind="stable"))
    cap_h = mean_cap(np.argsort(_hilbert3d_np(lat, lon), kind="stable"))
    assert cap_h <= cap_m * 1.001, (cap_h, cap_m)


def test_map_localization_builtin_coastlines():
    """Coastline fallback (reference observation.py:109-111 drew them via
    Basemap): with no geo toolkit in the image, coastlines='auto' draws the
    built-in coarse world outline, wrapped to the grid's 0-360 longitudes,
    without disturbing the data view limits."""
    import matplotlib

    matplotlib.use("Agg")
    from conftest import make_demo_state
    from efa_xray_tpu.observation.observation import Observation

    state = make_demo_state(ny=8, nx=10)  # lon 230-244 (0-360 convention)
    s = state.structure
    ob = Observation(value=1.0, obtype=s.var_names[0], time=s.times64()[0],
                     error=1.0, lat=float(s.lat[4, 5]), lon=float(s.lon[4, 5]),
                     localize_radius=300.0)
    ax = ob.map_localization(state)  # coastlines='auto' default
    assert len(ax.lines) >= 1  # outline drawn despite no cartopy/Basemap
    xd = ax.lines[0].get_xdata()
    assert np.nanmin(xd) >= 0.0 and np.nanmax(xd) < 360.0  # wrapped to grid
    lo, hi = ax.get_xlim()
    assert lo >= 229.0 and hi <= 245.0  # view stays on the data

    ax2 = ob.map_localization(state, coastlines=False)
    assert len(ax2.lines) == 0


def test_map_localization_user_segments(tmp_path):
    """A user-supplied coastline file (npz and csv forms) overlays those
    polylines; a projection callable is applied to them NaN-safely."""
    import matplotlib

    matplotlib.use("Agg")
    from conftest import make_demo_state
    from efa_xray_tpu.observation.observation import Observation
    from efa_xray_tpu.utils import coastlines as coast

    seg = np.array([[231.0, 43.0], [240.0, 47.0], [np.nan, np.nan],
                    [235.0, 44.0], [238.0, 49.0]])
    npz = tmp_path / "seg.npz"
    np.savez(npz, lonlat=seg)
    csv = tmp_path / "seg.csv"
    with open(csv, "w") as f:
        f.write("lon,lat\n")  # header row becomes a break, then stripped
        for lon, lat in seg:
            f.write("\n" if np.isnan(lon) else f"{lon},{lat}\n")
    got_npz = coast.load_segments(str(npz))
    got_csv = coast.load_segments(str(csv))
    np.testing.assert_allclose(got_npz, seg)
    # csv: leading header break + identical vertices/breaks
    np.testing.assert_allclose(got_csv[1:], seg)

    state = make_demo_state(ny=8, nx=10)
    s = state.structure
    ob = Observation(value=1.0, obtype=s.var_names[0], time=s.times64()[0],
                     error=1.0, lat=float(s.lat[4, 5]), lon=float(s.lon[4, 5]),
                     localize_radius=300.0)
    ax = ob.map_localization(state, coastlines=str(npz))
    (line,) = ax.lines
    assert np.nansum(line.get_ydata()) > 0  # user polylines drawn

    proj = lambda lon, lat: (lon * 2.0, lat * 3.0)
    ax2 = ob.map_localization(state, projection=proj, coastlines=seg)
    (line2,) = ax2.lines
    y = line2.get_ydata()
    np.testing.assert_allclose(y[np.isfinite(y)], seg[np.isfinite(seg[:, 1]), 1] * 3.0)


def test_wrap_segments_seam_breaks():
    """wrap_segments never draws across the longitude seam: wrapping
    inserts NaN breaks at >180-degree jumps in either convention."""
    from efa_xray_tpu.utils import coastlines as coast

    # crosses the dateline in [-180, 180); contiguous in [0, 360)
    seg = np.array([[170.0, 60.0], [-170.0, 61.0], [-160.0, 62.0]])
    w180 = coast.wrap_segments(seg, lon360=False)
    assert np.isnan(w180[:, 0]).sum() == 1  # one inserted break
    w360 = coast.wrap_segments(seg, lon360=True)
    assert not np.isnan(w360[:, 0]).any()
    np.testing.assert_allclose(w360[:, 0], [170.0, 190.0, 200.0])

    # crosses Greenwich: contiguous in [-180, 180), broken in [0, 360)
    seg2 = np.array([[-5.0, 50.0], [5.0, 51.0]])
    assert np.isnan(coast.wrap_segments(seg2, lon360=True)[:, 0]).sum() == 1
    assert not np.isnan(coast.wrap_segments(seg2, lon360=False)[:, 0]).any()


def test_builtin_world_outline_sanity():
    """The built-in outline is valid (finite lon/lat ranges, NaN-separated,
    a plausible number of segments) and lands known points correctly:
    no vertex within 3 degrees of mid-ocean points, some within 3 of
    well-known coastal cities."""
    from efa_xray_tpu.utils.coastlines import COARSE_WORLD_LONLAT as w

    lon, lat = w[:, 0], w[:, 1]
    ok = np.isfinite(lon)
    assert (np.abs(lon[ok]) <= 180.0).all() and (np.abs(lat[ok]) <= 90.0).all()
    assert 10 <= (~ok).sum() <= 40  # segment count in the intended range
    d2 = lambda plon, plat: np.nanmin(np.hypot(lon - plon, lat - plat))
    # mid-ocean: nothing nearby
    for plon, plat in [(-40.0, 30.0), (-150.0, 0.0), (80.0, -40.0)]:
        assert d2(plon, plat) > 5.0
    # coastal: something nearby at this fidelity
    for plon, plat in [(-122.0, 47.0), (0.0, 51.0), (140.0, 36.0),
                       (151.0, -34.0), (18.0, -34.0)]:
        assert d2(plon, plat) < 4.0
