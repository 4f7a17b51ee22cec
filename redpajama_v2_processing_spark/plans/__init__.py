"""Pipeline / stage-DAG layer."""
