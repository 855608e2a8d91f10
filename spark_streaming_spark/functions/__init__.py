"""Column-level function library (all JVM-side built-ins; no row UDFs)."""
