"""Structured Streaming twin of the reference's ingest pipeline
(reference src/integration/tsdb/process.go + processing/agreggator.go).

``pipeline`` assembles source -> filter -> enrich -> transform -> sinks;
``stateful`` holds the applyInPandasWithState operators (change-suppressed
pre-aggregation A1-A5 and counter-difference A6-A10) that built-in
windowed aggregation cannot express.
"""
