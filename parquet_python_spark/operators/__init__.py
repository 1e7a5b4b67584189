"""DataFrame-level operators: generic column encode/decode round-trip,
training-data pipeline ops (dedup, text stats, fingerprinting, ANN)."""
