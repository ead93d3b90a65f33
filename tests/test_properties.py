"""Property-based tests (hypothesis) for the pure-numpy geometry kernels
(SURVEY §5.2.3).  These run without a SparkSession."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osmspark.functions import geo, hexgrid, s2
from osmspark.operators.spatial_join import points_in_rings_np

latlon = st.tuples(
    st.floats(min_value=-84.9, max_value=84.9, allow_nan=False),
    st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
)


@settings(max_examples=50, deadline=None)
@given(latlon)
def test_s2_parent_hierarchy_any_point(p):
    lat, lon = np.array([p[0]]), np.array([p[1]])
    c10 = s2.latlon_to_cellid(lat, lon, 10)
    c20 = s2.latlon_to_cellid(lat, lon, 20)
    assert s2.parent_id(c20, 10)[0] == c10[0]
    assert s2.cell_level(c10)[0] == 10 and s2.cell_level(c20)[0] == 20


@settings(max_examples=50, deadline=None)
@given(latlon, st.integers(min_value=5, max_value=10))
def test_hex_roundtrip_any_point(p, res):
    lat, lon = np.array([p[0]]), np.array([p[1]])
    c = hexgrid.latlon_to_cell(lat, lon, res)
    la, lo = hexgrid.cell_center_latlon(c)
    assert hexgrid.latlon_to_cell(la, lo, res)[0] == c[0]
    # the center is close to the original point (within 2 circumradii,
    # measured loosely in meters via haversine)
    d = geo.haversine_np(lat, lon, la, lo)[0]
    radius_uv = hexgrid._res_frame(res)[0]
    # uv->meters upper bound: ~1.6e7 m per uv unit at face edge
    assert d < 2 * radius_uv * 1.6e7


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=3, max_value=10),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_pip_vectorized_vs_scalar_random_polygon(nv, seed):
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    rad = rng.uniform(0.3, 2.0, nv)
    ry = 5 + rad * np.sin(ang)
    rx = 5 + rad * np.cos(ang)
    ry = np.append(ry, ry[0])
    rx = np.append(rx, rx[0])
    py = rng.uniform(2, 8, 64)
    px = rng.uniform(2, 8, 64)
    got = points_in_rings_np(py, px, [ry] * 64, [rx] * 64)

    def scalar(yy, xx):
        inside = False
        for i in range(len(ry) - 1):
            y1, x1, y2, x2 = ry[i], rx[i], ry[i + 1], rx[i + 1]
            if (y1 > yy) != (y2 > yy):
                if xx < x1 + (yy - y1) * (x2 - x1) / (y2 - y1):
                    inside = not inside
        return inside

    exp = np.array([scalar(py[i], px[i]) for i in range(64)])
    assert (got == exp).all()


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_kring_unique_and_symmetric(seed):
    rng = np.random.default_rng(seed)
    lat = np.array([rng.uniform(-80, 80)])
    lon = np.array([rng.uniform(-175, 175)])
    cell = hexgrid.latlon_to_cell(lat, lon, 8)
    k = int(rng.integers(1, 4))
    ring = hexgrid.kring(cell, k)[0]
    assert len(set(ring.tolist())) == 1 + 3 * k * (k + 1)
    # symmetry for immediate neighbors
    for n in hexgrid.kring(cell, 1)[0][1:]:
        assert int(cell[0]) in set(hexgrid.kring(np.array([n]), 1)[0].tolist())


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=8))
def test_ranges_property(counts):
    from osmspark.operators.spatial_join import _ranges

    out = _ranges(np.array(counts, dtype=np.int64))
    exp = [i for c in counts for i in range(c)]
    assert out.tolist() == exp
