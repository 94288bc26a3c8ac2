"""Sources/sinks: versioned table IO with idempotent-append semantics."""
