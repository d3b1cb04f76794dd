"""redmap_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference MapReduce framework
(erizocosmico/redmap), re-expressed Spark-first.

The reference executes user-defined map/filter/reduce chains across
workers; here every capability is declared through the DataFrame API so
Catalyst/Tungsten choose the physical plan (see SURVEY.md §4).
"""

from redmap_spark.session import get_spark
from redmap_spark.catalog import Catalog

__all__ = ["get_spark", "Catalog"]
__version__ = "0.1.0"
