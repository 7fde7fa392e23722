"""Training: optimizer groups, jitted+sharded train step, loop."""
