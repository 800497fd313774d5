"""Multi-stage jobs: the ER pipeline, dictionary build, evaluation, metrics."""
