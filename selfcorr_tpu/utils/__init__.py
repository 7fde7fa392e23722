"""Utilities: checkpointing, logging, weight conversion, visualization."""
