"""smile_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of DAMA-UPC/smile (see SURVEY.md).

The reference is a single-node C++ paged-storage engine whose query
surface lives in hand-written OpenMP benchmark kernels
(/root/reference/src/regtests/).  This package re-expresses every one of
those capabilities — scan, filter+count, group-by, hash join, graph
load/check, BFS — as declarative DataFrame programs that Catalyst can
optimize, plus the large-scale training-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal, windows) that the
north star requires.  Storage, buffer pool and tasking layers of the
reference are intentionally NOT rebuilt: Parquet + Spark's memory
manager + the Spark scheduler are their idiomatic equivalents
(SURVEY.md §1.1, §4.2).
"""

from smile_spark.session import get_spark
from smile_spark.tables import load_tables, table

__version__ = "0.1.0"

__all__ = ["get_spark", "load_tables", "table", "__version__"]
