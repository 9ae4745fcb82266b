"""Source-side operators: row→document conversion rules (reference
river/converter.go parity) and CDC-shaped change feeds."""
