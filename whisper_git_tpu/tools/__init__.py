"""Developer tools: golden scene dumps + rendering smoke tests
(reference: src/bin/dump_bundles.rs, src/bin/vector_smoke.rs)."""
