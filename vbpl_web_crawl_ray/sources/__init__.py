"""Sources: the deterministic simulated web, image payload codecs, readers."""
