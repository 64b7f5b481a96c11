"""Co-processor state machines (reference: src/sm/*)."""
