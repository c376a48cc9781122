"""Engine: loss, metrics, jit'd train/eval steps, checkpointing (SURVEY.md L3)."""
