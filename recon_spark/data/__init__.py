"""Bundled dimension-table snapshots (PSL rules, trained quality weights)."""
