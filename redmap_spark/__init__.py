"""redmap_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference MapReduce framework
(erizocosmico/redmap), re-expressed Spark-first.

The reference executes user-defined map/filter/reduce chains across
workers; here every capability is declared through the DataFrame API so
Catalyst/Tungsten choose the physical plan (see SURVEY.md §4).

Public surface::

    from redmap_spark import get_spark, Catalog, Pipeline
    from redmap_spark.operators import dedup, similarity, textstats
    from redmap_spark.operators.asof import asof_join
    from redmap_spark.operators.skew import salted_join
    from redmap_spark.pipelines import prepare_training_corpus
"""

from redmap_spark.api import Pipeline
from redmap_spark.catalog import Catalog
from redmap_spark.session import get_spark

__all__ = ["get_spark", "Catalog", "Pipeline"]
__version__ = "0.1.0"
