"""Host-side utilities: events, logging, file sinks, waterfall rendering."""
