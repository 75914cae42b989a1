"""Pipeline plans: the end-to-end MDM DAG driver."""
