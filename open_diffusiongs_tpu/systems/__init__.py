"""Training/eval systems (object + scene) and losses."""
