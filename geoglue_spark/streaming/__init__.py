"""Incremental / streaming layer: resumable chunked processing + windows."""
