"""Higher-level operators over the store/catalog:

- ``metrics``: the timeseries metrics API (A26) — declared but
  NotImplemented in the reference (lite/src/handlers/v1/metrics.rs),
  implemented for real here as windowed aggregations.
- ``reconcile``: `s2 diff` / `s2 apply` — declarative spec vs actual
  catalog reconciliation (A30).
- ``maintenance``: background task analogues — trim executor,
  retention TTL, delete-on-empty, basin deletion (A17/A18/A20).
- ``crypto``: CSEK-style body encryption (A19) via Spark's builtin
  AES-GCM with stream-bound AAD.
"""
