"""Z-order clustering (x61) — the pruning property that justifies the
layout: a 2-D range predicate touches far fewer z-order buckets than
row-major (1-D sort) buckets over the same grid."""

import numpy as np


def _z(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    z = np.zeros_like(x)
    for b in range(8):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_square_region_touches_fewer_z_buckets():
    # full 256x256 grid; one "file" = 256 consecutive keys in each layout
    xs, ys = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    xs, ys = xs.ravel(), ys.ravel()
    z_bucket = _z(xs, ys) >> 8
    rowmajor_bucket = (xs * 256 + ys) >> 8
    # a 16x16 query square away from the origin
    m = (xs >= 64) & (xs < 80) & (ys >= 32) & (ys < 48)
    z_touched = len(np.unique(z_bucket[m]))
    rm_touched = len(np.unique(rowmajor_bucket[m]))
    # row-major: every x-row is its own bucket -> 16 buckets;
    # z-order: the square is covered by a handful of quadtree cells
    assert rm_touched == 16
    assert z_touched <= 4
    # both layouts use the same number of files overall
    assert len(np.unique(z_bucket)) == len(np.unique(rowmajor_bucket)) == 256


def test_z_is_a_bijection_on_the_grid():
    xs, ys = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    z = _z(xs.ravel(), ys.ravel())
    assert len(np.unique(z)) == 256 * 256
    assert z.min() == 0 and z.max() == 256 * 256 - 1


def test_spark_z_matches_reference_bits(spark):
    from video_stream_processing_spark.plans.registry import query_map

    out = query_map()["x61_zorder_clustering"](spark, "/root/testdata/sf0.001")
    rows = out.limit(500).collect()
    for r in rows:
        assert r["z_value"] == int(_z(np.array([r["x_dim"]]), np.array([r["y_dim"]]))[0])
        assert r["z_bucket"] == r["z_value"] >> 8
