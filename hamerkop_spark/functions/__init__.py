"""Scalar function library: native column expressions first, batched
Arrow/pandas UDFs only where the JVM genuinely can't express the semantics
(string-distance bundle, phonetic metaphone, romanization)."""
