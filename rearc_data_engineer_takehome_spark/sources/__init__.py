"""Sources & sinks: file readers, HTTP mirror-sync ingestion, table writers."""
