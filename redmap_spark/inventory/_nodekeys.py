"""BIGINT node encoding for the bipartite customer–supplier graphs.

The iterative graph queries (pagerank / cc / bfs / kcore / label
propagation / ppr / matching / betweenness) shuffle their vertex keys
every round. Hashing and sorting BIGINT keys is measurably cheaper
than 'c123'-style varchar keys — PERF.md #62(a) measured the win on
mr_betweenness — so vertices ride through every join and groupBy as
ints: customers encode to 2*custkey, suppliers to 2*suppkey+1
(disjoint, reversible).

Strings still appear in exactly two places, both required for
bit-identical oracle parity:

- final display projections (``node_str``), because the oracles
  report 'c…'/'s…' node names;
- order-sensitive STRING semantics the oracle states in string space
  (min-label in cc/label-propagation, the 'c…>s…' edge keys in
  matching, seed/rank tie-breaks in ppr). There the string is a
  derived PAYLOAD column — the shuffle key stays BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def enc_cust(col: Column) -> Column:
    """Customer key -> even BIGINT node id."""
    return (col.cast("bigint") * 2).alias("src")


def enc_supp(col: Column) -> Column:
    """Supplier key -> odd BIGINT node id."""
    return (col.cast("bigint") * 2 + 1).alias("dst")


def node_str(col: Column) -> Column:
    """Decode a BIGINT node id back to the oracle's 'c…'/'s…' name."""
    return F.when(
        col % 2 == 0,
        F.concat(F.lit("c"), (col / 2).cast("bigint").cast("string")),
    ).otherwise(
        F.concat(F.lit("s"), ((col - 1) / 2).cast("bigint").cast("string"))
    )
