"""PySpark-native inverted-index + BM25 engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of snowplow/snowplow-elasticsearch-loader
(reference read-only at /root/reference): the loader's explicit
streaming dataflow (parse -> transform -> batch -> bulk-index ->
dead-letter -> metrics -> checkpoint, reference
modules/core/.../core/Processing.scala:76-84) plus the capabilities it
delegates to Elasticsearch (tokenization, inverted-index construction,
date-sharded routing, mapping enforcement, top-k BM25 search,
reference modules/core/.../core/ElasticsearchSink.scala:90-97).

Everything here is the idiomatic-Spark design, not a port: DataFrame /
Spark SQL plans optimized by Catalyst, with vectorized Arrow UDFs only
where relational operators cannot express the semantics (SPIMI block
build, varint codecs, block-max WAND).
"""

__version__ = "0.1.0"

from .config import EngineConfig  # noqa: F401
