"""Source readers.  The reference supports exactly two inputs: its
proprietary paged file and a text edge list (SURVEY.md §2.2).  The
paged file's Spark-native equivalent is parquet (smile_spark.tables);
the edge-list reader lives here, plus thin wrappers for the standard
columnar/row formats Spark provides for free."""

from smile_spark.sources.edge_list import read_edge_list

__all__ = ["read_edge_list"]
