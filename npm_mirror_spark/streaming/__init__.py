"""Structured Streaming shell: the reference's consumer pipeline
(changes_consumer.py) as one streaming query with multi-sink fan-out."""
