"""frankensearch_spark: PySpark-native BM25 lexical search engine."""
