"""Input readers + deterministic corpus synthesis."""
