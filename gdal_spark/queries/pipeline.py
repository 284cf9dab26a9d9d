"""Training-data pipeline ops (filled in batch 3)."""
