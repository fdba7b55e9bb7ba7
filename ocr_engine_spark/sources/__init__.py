"""Input connectors that materialize the canonical pages table."""
