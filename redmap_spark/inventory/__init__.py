"""SURVEY §2 inventory: importing this package registers every query."""

from redmap_spark.inventory.registry import ORACLES, QUERIES

# Registration order matters: the driver's CORRECTNESS run verifies the FIRST
# 50 queries() entries in registration order. The LLM-pipeline operators
# (dedup / similarity / text / multimodal / mapreduce) register first so they
# land inside that window; the relational/analytic queries (driver-green in
# round 1) take the overflow slots.
from redmap_spark.inventory import dedup  # noqa: F401
from redmap_spark.inventory import similarity  # noqa: F401
from redmap_spark.inventory import text  # noqa: F401
from redmap_spark.inventory import multimodal  # noqa: F401
from redmap_spark.inventory import sketches  # noqa: F401
from redmap_spark.inventory import mapreduce  # noqa: F401
from redmap_spark.inventory import cohorts  # noqa: F401
from redmap_spark.inventory import relational  # noqa: F401
from redmap_spark.inventory import relational2  # noqa: F401
from redmap_spark.inventory import analytic  # noqa: F401
from redmap_spark.inventory import relational3  # noqa: F401
from redmap_spark.inventory import relational4  # noqa: F401
from redmap_spark.inventory import changefeed  # noqa: F401
from redmap_spark.inventory import linkage  # noqa: F401
from redmap_spark.inventory import quality  # noqa: F401

# The driver's 50-entry CORRECTNESS window is the strongest signal available
# (rows+schema+value-hash vs DuckDB); entries without an oracle only get a
# weak rows-only row there. Move the no-oracle entries (approximate ANN,
# sketch-bound, binary-output multimodal — each covered by recall/error-bound
# pytest instead) to the END so every window slot is hash-checkable.
for _name in [k for k in list(QUERIES) if k not in ORACLES]:
    QUERIES[_name] = QUERIES.pop(_name)

__all__ = ["QUERIES", "ORACLES"]
