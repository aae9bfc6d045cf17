"""CLI entry points (train / generate / evaluate / synthesize)."""
