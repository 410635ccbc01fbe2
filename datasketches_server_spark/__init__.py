"""PySpark-native analytics engine with the query/data-processing
capabilities of apache/datasketches-server, re-expressed Spark-first.

The reference (/root/reference, Java, Jetty HTTP server over an in-memory
named-sketch map) models *streaming aggregation state*: update -> merge ->
query over mergeable sketches (SketchStorage.java:49, UpdateHandler.java,
MergeHandler.java, DataQueryHandler.java).  This engine realizes the same
capability as data, not a server: sketch state lives in BINARY columns of
DataFrames/tables, updates are `groupBy().agg(<sketch_agg>)`, merges are
`*_union_agg` at any level of rollup, and queries are plain selects with
sketch-evaluate expressions -- all planned by Catalyst with automatic
partial/final aggregation.

On top of that parity layer sits a web-scale near-duplicate detection and
clustering pipeline over multi-turn conversation transcripts (MinHash /
SimHash / suffix arrays + LSH + connected components), plus the
training-data operators a 100 TB corpus pipeline needs (dedup family,
similarity search, text analysis, multimodal plumbing).
"""

__version__ = "0.1.0"
