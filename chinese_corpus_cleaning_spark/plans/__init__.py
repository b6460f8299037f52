"""Pipeline plans: end-to-end jobs, lineage/metrics, checkpoint resume."""
