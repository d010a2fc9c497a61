"""CLI: one entry point replacing the reference's 4x3 scripts."""
