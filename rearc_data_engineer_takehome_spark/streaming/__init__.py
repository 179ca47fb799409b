"""Event-time windowing (batch + Structured Streaming)."""
