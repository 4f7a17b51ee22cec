"""Sources/sinks for the canonical pages table."""
