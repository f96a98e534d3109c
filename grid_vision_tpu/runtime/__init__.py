"""Host runtime: native ingest/packing, streaming replay, checkpointing."""
