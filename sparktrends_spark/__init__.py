"""sparktrends_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capability surface of the reference
"SparkTrends" market-trends platform (see SURVEY.md), expressed as an
idiomatic Spark DataFrame/SQL/Structured-Streaming library, plus the
large-scale training-data operations (dedup, similarity search, text
analysis, multimodal columns) the reference does not have.

Layout:
    session     SparkSession factory (AQE on, sized shuffles, UTC)
    schemas     canonical StructType contracts (trades, bars, metrics, ...)
    sources/    parquet testdata loaders, Kafka bounded/stream, JDBC, files
    sinks/      JDBC/Kafka/parquet writers, alert callbacks
    operators/  parse, bars, metrics, topk, joins, setops, sessionize
    text/       text analysis + exact/near dedup (MinHash, SimHash, Jaccard)
    similarity/ embedding cosine top-k, LSH-bucketed ANN
    multimodal/ binary-column conventions + stubbed decoders
    streaming/  watermarked streaming jobs (trades -> bars -> metrics)
    queries     the named query registry driving __spark_entry__
"""

__version__ = "0.1.0"
