"""Input sources beyond Parquet: CSV (with dialect sniffing, the
reference's front door), gated SQL/Excel stubs."""
