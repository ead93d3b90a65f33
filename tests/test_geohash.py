"""Geohash tests: published-spec golden vectors, a verbatim canonical
subdivision-loop oracle, roundtrips, neighbors, and plan purity.

This is the one grid the engine claims EXTERNAL bit-compatibility for
(s2/hexgrid golden vectors are self-frozen — see test_cells.py), so the
oracle here is the published algorithm itself, re-implemented as the
textbook interval-bisection loop and compared on random points at every
precision.
"""

import numpy as np
from pyspark.sql import functions as F

from osmspark.functions import geohash

B32 = geohash.B32


def gh_oracle(lat, lon, precision):
    """The published geohash algorithm, verbatim: alternating binary
    subdivision of the lon/lat intervals, 5-bit groups through base32."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for k in range(precision):
        v = 0
        for b in bits[5 * k : 5 * k + 5]:
            v = v * 2 + b
        out.append(B32[v])
    return "".join(out)


def _encode_batch(spark, pts, precision):
    df = spark.createDataFrame(pts, "lat double, lon double")
    rows = df.select(
        geohash.encode(F.col("lat"), F.col("lon"), precision).alias("gh")
    ).collect()
    return [r["gh"] for r in rows]


# --- published golden vectors (the spec's own examples) ---------------------
def test_spec_golden_vectors(spark):
    got = _encode_batch(spark, [(57.64911, 10.40744)], 11)
    assert got == ["u4pruydqqvj"]  # the canonical wiki example
    got = _encode_batch(spark, [(42.605, -5.603)], 5)
    assert got == ["ezs42"]
    got = _encode_batch(spark, [(0.0, 0.0)], 12)
    assert got == ["s00000000000"]
    # closed upper edge clamps into the all-ones cell; lower edge all-zeros
    got = _encode_batch(spark, [(90.0, 180.0), (-90.0, -180.0)], 6)
    assert got == ["zzzzzz", "000000"]


def test_matches_canonical_loop_all_precisions(spark):
    rng = np.random.default_rng(7)
    lat = rng.uniform(-90, 90, 200)
    lon = rng.uniform(-180, 180, 200)
    pts = [(float(a), float(o)) for a, o in zip(lat, lon)]
    for precision in (1, 2, 5, 8, 11, 12):
        want = [gh_oracle(a, o, precision) for a, o in pts]
        got = _encode_batch(spark, pts, precision)
        assert got == want, f"precision={precision}"


def test_decode_encode_roundtrip(spark):
    rng = np.random.default_rng(11)
    pts = [
        (float(a), float(o))
        for a, o in zip(rng.uniform(-90, 90, 150), rng.uniform(-180, 180, 150))
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    p = 9
    # decode(encode(...)) composes safely in one projection (decode is
    # `_let`-barriered); the re-encode runs against MATERIALIZED decode
    # output — the cross-stage path a real pipeline takes — because
    # encode() is the codegen cascade that multiplies large argument
    # expressions (see the `_let` docstring).
    rows = df.select(
        "lat",
        "lon",
        geohash.encode(F.col("lat"), F.col("lon"), p).alias("gh"),
        geohash.decode(geohash.encode(F.col("lat"), F.col("lon"), p)).alias("d"),
    ).collect()
    centers = [(r["d"]["lat"], r["d"]["lon"], r["gh"]) for r in rows]
    for r in rows:
        assert abs(r["lat"] - r["d"]["lat"]) <= r["d"]["lat_err"] + 1e-12
        assert abs(r["lon"] - r["d"]["lon"]) <= r["d"]["lon_err"] + 1e-12
    df2 = spark.createDataFrame(centers, "clat double, clon double, gh string")
    out = df2.select(
        "gh", geohash.encode(F.col("clat"), F.col("clon"), p).alias("gh2")
    )
    for r in out.collect():
        assert r["gh2"] == r["gh"]  # center re-encodes to the same cell


def test_interp_encode_composes_in_one_projection(spark):
    """`_encode_interp` is the composition-safe variant: encode→decode→
    re-encode in ONE projection, which would blow the Catalyst tree with
    the codegen cascade, stays additive behind the `_let` barriers."""
    rng = np.random.default_rng(13)
    pts = [
        (float(a), float(o))
        for a, o in zip(rng.uniform(-90, 90, 40), rng.uniform(-180, 180, 40))
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    p = 8
    d = geohash.decode(geohash.encode(F.col("lat"), F.col("lon"), p))
    out = df.select(
        geohash.encode(F.col("lat"), F.col("lon"), p).alias("gh"),
        geohash._encode_interp(d["lat"], d["lon"], p).alias("gh2"),
    )
    for r in out.collect():
        assert r["gh2"] == r["gh"]


def test_decode_variable_length_and_known_value(spark):
    df = spark.createDataFrame([("ezs42",), ("u4pruydqqvj",), ("s",)], "gh string")
    rows = (
        df.select("gh", geohash.decode(F.col("gh")).alias("d"))
        .select("gh", "d.*")
        .collect()
    )
    byg = {r["gh"]: r for r in rows}
    # the spec's worked example: ezs42 -> 42.605, -5.603 at ~±0.02/±0.02
    assert abs(byg["ezs42"]["lat"] - 42.60498046875) < 1e-9
    assert abs(byg["ezs42"]["lon"] - (-5.60302734375)) < 1e-9
    assert abs(byg["u4pruydqqvj"]["lat"] - 57.64911) < 1e-4
    assert abs(byg["u4pruydqqvj"]["lon"] - 10.40744) < 1e-4
    # 1-char cell: lat_err 22.5, lon_err 22.5? lon gets 3 bits, lat 2
    assert abs(byg["s"]["lat_err"] - 45.0 / 2) < 1e-12
    assert abs(byg["s"]["lon_err"] - 45.0 / 2) < 1e-12


def test_decode_unknown_char_yields_null(spark):
    df = spark.createDataFrame([("ea!",)], "gh string")
    r = df.select(geohash.decode(F.col("gh")).alias("d")).collect()[0]
    assert r["d"]["lat"] is None and r["d"]["lon"] is None


def test_neighbors_adjacency_and_pole(spark):
    p = 6
    df = spark.createDataFrame(
        [(40.7128, -74.0060), (89.999, 10.0), (10.0, 179.9999)],
        "lat double, lon double",
    )
    rows = (
        df.select(
            geohash.encode(F.col("lat"), F.col("lon"), p).alias("gh"),
            geohash.neighbors(
                geohash.encode(F.col("lat"), F.col("lon"), p), p
            ).alias("nb"),
        )
        .collect()
    )
    mid, pole, anti = rows
    assert len(mid["nb"]) == 8 and len(set(mid["nb"])) == 8
    assert mid["gh"] not in mid["nb"]
    # pole cell: the 3 latitude-overflow steps drop -> 5 neighbors
    assert len(pole["nb"]) == 5
    # antimeridian: all 8 present, and at least one neighbor is on the
    # western hemisphere side (lon wrapped) — verify via decode
    assert len(anti["nb"]) == 8
    ndf = spark.createDataFrame([(g,) for g in anti["nb"]], "gh string")
    lons = [
        r["lon"]
        for r in ndf.select(geohash.decode(F.col("gh")).alias("d"))
        .select("d.lon")
        .collect()
    ]
    assert any(lon < -179.0 for lon in lons), lons


def test_neighbors_match_oracle_grid(spark):
    """Each neighbor equals the oracle encoding of center ± one cell."""
    p = 5
    lat0, lon0 = 48.8566, 2.3522
    gh0 = gh_oracle(lat0, lon0, p)
    d = (
        spark.createDataFrame([(gh0,)], "gh string")
        .select(geohash.decode(F.col("gh")).alias("d"))
        .collect()[0]["d"]
    )
    want = set()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            want.add(
                gh_oracle(
                    d["lat"] + dy * 2 * d["lat_err"],
                    d["lon"] + dx * 2 * d["lon_err"],
                    p,
                )
            )
    got = (
        spark.createDataFrame([(gh0,)], "gh string")
        .select(geohash.neighbors(F.col("gh"), p).alias("nb"))
        .collect()[0]["nb"]
    )
    assert set(got) == want


def test_py_twin_matches_spark_encode(spark):
    rng = np.random.default_rng(17)
    pts = [
        (float(a), float(o))
        for a, o in zip(rng.uniform(-90, 90, 120), rng.uniform(-180, 180, 120))
    ]
    for p in (1, 4, 7, 12):
        want = [geohash._encode_py(a, o, p) for a, o in pts]
        assert _encode_batch(spark, pts, p) == want, f"precision={p}"


def test_cover_bbox_contains_inner_points_and_only_intersecting_cells(spark):
    p = 5
    lat_min, lat_max, lon_min, lon_max = 40.0, 41.2, -74.5, -72.9
    cover = set(geohash.cover_bbox(lat_min, lat_max, lon_min, lon_max, p))
    assert 0 < len(cover) <= 4096
    # every point inside the bbox encodes into the cover
    rng = np.random.default_rng(23)
    pts = [
        (float(a), float(o))
        for a, o in zip(
            rng.uniform(lat_min, lat_max, 300), rng.uniform(lon_min, lon_max, 300)
        )
    ]
    got = _encode_batch(spark, pts, p)
    assert all(g in cover for g in got)
    # and every cover cell actually intersects the bbox (via decode extents)
    df = spark.createDataFrame([(g,) for g in cover], "gh string")
    rows = (
        df.select(geohash.decode(F.col("gh")).alias("d")).select("d.*").collect()
    )
    eps = 1e-9
    for r in rows:
        assert r["lat"] + r["lat_err"] >= lat_min - eps
        assert r["lat"] - r["lat_err"] <= lat_max + eps
        assert r["lon"] + r["lon_err"] >= lon_min - eps
        assert r["lon"] - r["lon_err"] <= lon_max + eps


def test_cover_bbox_antimeridian_and_max_cells():
    p = 3
    cover = geohash.cover_bbox(-10.0, 10.0, 170.0, -170.0, p, max_cells=4096)
    # cells on both sides of the antimeridian
    east = [g for g in cover if geohash._encode_py(0.0, 175.0, 1)[0] == g[0]]
    west = [g for g in cover if geohash._encode_py(0.0, -175.0, 1)[0] == g[0]]
    assert east and west
    # points on each side land in the cover
    for lon in (171.3, 179.9, -179.9, -170.4):
        assert geohash._encode_py(2.0, lon, p) in cover
    # a too-fine precision refuses loudly instead of shipping a huge IN-list
    import pytest

    with pytest.raises(ValueError, match="max_cells"):
        geohash.cover_bbox(-10.0, 10.0, 170.0, -170.0, 9, max_cells=64)


def test_cover_bbox_prunes_geohash_partitioned_layout(tmp_path, spark, nodes):
    """The cover_bbox docstring's claim, end to end: a geohash-partitioned
    layout + an IN-list from the cover gives (a) the same answer as the
    unpruned bbox scan and (b) the IN-list as a PartitionFilter, i.e.
    directory-level pruning before any geometry runs."""
    p = 5
    path = str(tmp_path / "gh_layout")
    pts = nodes.select("id", "lat", "lon").withColumn(
        "gh", geohash.encode(F.col("lat"), F.col("lon"), p)
    )
    pts.write.partitionBy("gh").parquet(path)
    # central sub-box of the data's own extent (datagen-agnostic)
    ext = pts.agg(
        F.min("lat"), F.max("lat"), F.min("lon"), F.max("lon")
    ).collect()[0]
    lat_min = ext[0] + 0.3 * (ext[1] - ext[0])
    lat_max = ext[0] + 0.6 * (ext[1] - ext[0])
    lon_min = ext[2] + 0.3 * (ext[3] - ext[2])
    lon_max = ext[2] + 0.6 * (ext[3] - ext[2])
    cover = geohash.cover_bbox(lat_min, lat_max, lon_min, lon_max, p)
    back = spark.read.parquet(path)
    inside = F.col("lat").between(lat_min, lat_max) & F.col("lon").between(
        lon_min, lon_max
    )
    pruned = back.where(F.col("gh").isin(cover)).where(inside)
    full = back.where(inside)
    assert pruned.count() == full.count() > 0
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "gh" in pf
    # and the cover actually prunes: fewer partition dirs than written
    n_parts = back.select("gh").distinct().count()
    assert len(cover) < n_parts


def test_plan_is_pure_native(spark):
    df = spark.range(100).select(
        (F.rand(1) * 180 - 90).alias("lat"), (F.rand(2) * 360 - 180).alias("lon")
    )
    out = df.select(
        geohash.encode(F.col("lat"), F.col("lon"), 9).alias("gh")
    ).select(geohash.decode(F.col("gh")).alias("d"), "gh")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
