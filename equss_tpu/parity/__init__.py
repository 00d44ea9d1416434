"""Twin-training parity harness vs the torch reference (BASELINE.md
parity protocol).  See equss_tpu.parity.twin."""
