"""Logical-plan-level helpers: SQL dialect rewriting before Catalyst."""
