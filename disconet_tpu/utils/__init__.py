"""Host-side utilities: visualization, misc helpers."""
