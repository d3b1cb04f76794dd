"""Z-order clustering (operators/zorder.py): multi-dimensional data
skipping measured from the parquet footers themselves — the row-group
min/max stats the scan's predicate evaluation uses."""

from __future__ import annotations

from redmap_spark.catalog import Catalog
from redmap_spark.operators.zorder import row_groups_overlapping, write_zordered
from tests.conftest import SF_DIR


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """The 1-D layout (sorted by custkey) prunes only custkey
    predicates — a totalprice range overlaps ~every row group. The
    z-ordered layout prunes BOTH dimensions to a fraction of the
    groups: the property that makes one physical layout serve every
    selective dashboard filter at 100 TB."""
    o = Catalog(spark, SF_DIR).orders
    zp, lp = str(tmp_path / "z"), str(tmp_path / "linear")
    write_zordered(o, zp, "o_custkey", "o_totalprice", n_files=4, rows_per_group=1000)
    (
        o.repartitionByRange(4, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .option("parquet.block.size", 32000)
        .parquet(lp)
    )

    z_price, z_total = row_groups_overlapping(zp, "o_totalprice", 100000.0, 120000.0)
    l_price, l_total = row_groups_overlapping(lp, "o_totalprice", 100000.0, 120000.0)
    z_cust, _ = row_groups_overlapping(zp, "o_custkey", 100.0, 200.0)
    l_cust, _ = row_groups_overlapping(lp, "o_custkey", 100.0, 200.0)

    # linear layout cannot skip on the non-sort dimension
    assert l_price >= 0.9 * l_total, (l_price, l_total)
    # z-order skips most groups on BOTH dimensions (measured ~45%/28%
    # overlap at sf0.01; allow slack for row-group boundary variance)
    assert z_price <= 0.65 * z_total, (z_price, z_total)
    assert z_cust <= 0.65 * z_total, (z_cust, z_total)
    # the 1-D layout stays better on its own sort key — z-order trades
    # a little single-dim locality for every-dim locality
    assert l_cust <= z_cust
