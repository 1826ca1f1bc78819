"""Query plans: medallion assemblies, cleaning pipelines, query catalog."""
