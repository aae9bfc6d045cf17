"""Training tier: losses, schedules, train state, the jitted train step."""
