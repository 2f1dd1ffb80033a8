"""Subprocess-facing tools: the JVM DataSource bridge lives here."""
