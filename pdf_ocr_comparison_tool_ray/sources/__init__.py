"""Sources & sinks: documents-table IO and interleave derivation."""
