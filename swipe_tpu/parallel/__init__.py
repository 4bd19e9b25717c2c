"""Multi-chip / multi-host execution: sharding, collectives, top-K merge."""
