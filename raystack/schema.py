"""Frozen webtext schema (BASELINE.json input_hint): the Common-Crawl-style
web-page table the encode pipeline targets."""

from __future__ import annotations

import pyarrow as pa

WEBTEXT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

#: columns in priority order for partition-key derivation
URL_COLUMN = "url"
