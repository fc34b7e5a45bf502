"""End-to-end pipeline plans: stage DAG, checkpoint/resume, metrics."""
