"""Lineage records and checkpoint manifests."""
