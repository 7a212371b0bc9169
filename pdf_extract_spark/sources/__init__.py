"""Pluggable sources (SURVEY S2/S7): Python Data Source API connectors."""
