"""Change-stream sources: fixture generation + batch/stream readers."""
