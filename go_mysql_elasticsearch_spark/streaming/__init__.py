"""Incremental / streaming index maintenance (CDC-equivalent path)."""
