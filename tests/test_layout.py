"""M6 cell-bucketed layout: correctness + partition pruning proof."""

import numpy as np
from pyspark.sql import functions as F

from osmspark.functions.hexgrid import kring, latlon_to_cell
from osmspark.plans import layout


def test_bucketed_write_read_roundtrip(tmp_path, spark, nodes):
    path = str(tmp_path / "bucketed")
    pts = nodes.select("id", "lat", "lon")
    layout.write_cell_bucketed(pts, path, res=7, n_buckets=16)

    back = spark.read.parquet(path)
    assert back.count() == pts.count()
    assert {"cell", "cell_bucket"} <= set(back.columns)

    # neighborhood read returns exactly the rows whose cell is in the ring
    center_lat, center_lon = 1.29, 103.85
    got = layout.read_neighborhood(
        spark, path, center_lat, center_lon, res=7, ring=1, n_buckets=16
    )
    cells = set(
        kring(latlon_to_cell(np.array([center_lat]),
                             np.array([center_lon]), 7), 1)[0].tolist()
    )
    exp = back.filter(F.col("cell").isin([int(c) for c in cells]))
    assert got.count() == exp.count() > 0


def test_partition_pruning_in_plan(tmp_path, spark, nodes):
    path = str(tmp_path / "bucketed2")
    layout.write_cell_bucketed(nodes.select("id", "lat", "lon"), path,
                               res=7, n_buckets=16)
    df = layout.read_cells(
        spark, path,
        latlon_to_cell(np.array([1.29]), np.array([103.85]), 7).tolist(),
        n_buckets=16,
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the bucket predicate must appear as a partition filter, not only a
    # data filter
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "cell_bucket" in pf


def test_clustered_write_sorts_cells_within_files(tmp_path, spark, nodes):
    """The layout's second pruning level (row-group skipping on the exact
    cell filter) exists iff rows are cell-sorted inside each bucket file —
    pin the physical invariant directly in the written parquet."""
    import glob

    import pyarrow.parquet as pq_read

    path = str(tmp_path / "bucketed3")
    layout.write_cell_bucketed(nodes.select("id", "lat", "lon"), path,
                               res=9, n_buckets=4)
    files = glob.glob(f"{path}/cell_bucket=*/*.parquet")
    assert files
    multi = 0
    for f in files:
        t = pq_read.read_table(f, columns=["cell"])
        cells = t.column("cell").to_numpy(zero_copy_only=False)
        assert (np.diff(cells) >= 0).all(), f
        if len(np.unique(cells)) > 1:
            multi += 1
    assert multi > 0   # the invariant was exercised on nontrivial files
