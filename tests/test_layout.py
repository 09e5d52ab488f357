"""Z-order layout (operators.layout): Morton key bit math, bucket
clamping, and the actual row-group pruning payoff on written parquet
footers."""

import glob

import pytest
from pyspark.sql import functions as F

from margaret_spark.operators.layout import range_bucket, write_zordered, zorder_key


def _interleave(vals, bits):
    z = 0
    n = len(vals)
    for j in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> j) & 1) << (j * n + i)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(a, b) for a in (0, 1, 5, 200, 255) for b in (0, 3, 17, 255)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn(
            "z", zorder_key([F.col("a"), F.col("b")], bits=8)
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _interleave([a, b], 8)


def test_zorder_guards(spark):
    with pytest.raises(ValueError, match="63"):
        zorder_key([F.col("a")] * 8, bits=8)  # 64 bits
    with pytest.raises(ValueError, match="at least one"):
        zorder_key([], bits=8)
    with pytest.raises(ValueError, match="hi > lo"):
        range_bucket(F.col("a"), 5.0, 5.0, 8)
    with pytest.raises(ValueError, match="bits"):
        range_bucket(F.col("a"), 0.0, 1.0, 0)


def test_range_bucket_clamps_and_propagates_null(spark):
    df = spark.createDataFrame(
        [(0, -5.0), (1, 0.0), (2, 50.0), (3, 99.9), (4, 150.0), (5, None)],
        "i long, v double",
    )
    got = {
        r.i: r.b
        for r in df.withColumn(
            "b", range_bucket(F.col("v"), 0.0, 100.0, 4)
        ).collect()
    }
    assert got[0] == 0 and got[1] == 0          # clamp low / lo edge
    assert got[2] == 8                            # midpoint → cell 8 of 16
    assert got[4] == 15                           # clamp high
    assert got[5] is None


def test_write_zordered_bounds_both_dims_per_row_group(spark, tmp_path):
    """The payoff claim: after z-order clustering, each row group's
    min/max footer range is NARROW on every interleaved dimension —
    which is exactly what lets a scan filtered on either column skip
    row groups. Compared against the unclustered write."""
    import pyarrow.parquet as pq

    rows = [(i, (i * 131) % 256, (i * 17) % 256) for i in range(20000)]
    df = spark.createDataFrame(rows, "id long, x long, y long").repartition(4)

    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, [F.col("x"), F.col("y")], bits=8, num_files=8)
    upath = str(tmp_path / "u")
    df.write.mode("overwrite").parquet(upath)

    def avg_span(path, col):
        spans, total = [], 0
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                spans.append(st.max - st.min)
                total += 1
        return sum(spans) / max(1, total)

    for col in ("x", "y"):
        z_span = avg_span(zpath, col)
        u_span = avg_span(upath, col)
        # each z file covers ~1/8 of the z-space → ~1/2-1/3 of each
        # dim's range; unclustered row groups span ~the full 255
        assert z_span < u_span * 0.7, (col, z_span, u_span)
