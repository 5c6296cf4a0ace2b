"""Expression-level helpers (built-in-first, JVM-side)."""
