"""Job-level plans: fingerprint -> candidates -> verify -> cluster."""
