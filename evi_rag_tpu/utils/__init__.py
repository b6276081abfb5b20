"""Cross-cutting infrastructure: config, logging, registry, run context."""
