"""Plan-time machinery: schema registry (fingerprint + additive
widening), the engine analogue of the reference's per-schema
SchemaBuilder cache (JC:84-93,551-633)."""
