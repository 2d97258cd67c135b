"""Event-time windowing over the ``events`` stream table.

Batch expressions (window / session_window work in batch mode) are the
oracle-checked surface; :mod:`.windows` also exposes the Structured
Streaming variants (readStream + watermark) over the same logic.
"""
