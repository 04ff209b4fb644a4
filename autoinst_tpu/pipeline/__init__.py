"""Public pipeline surface: config, preprocessing stages, chunk NCuts, merge,
run_pipeline orchestration (reference: pipeline/run_pipeline.py + config.py)."""
