"""Inverted-index construction: codec, segment build, manifests, reader."""
