"""Config, schedules, EMA, checkpointing, saving, misc utilities."""
