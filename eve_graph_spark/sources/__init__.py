"""Source connectors: driver test tables, ESI/EVE-Scout JSON, graph fixtures."""
