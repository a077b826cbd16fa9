"""Schema formatting, JSON-safe serialization, footer metadata, completions."""
