"""CLI entry points (parity: FD/baseline.py, FD/train.py, CC/examples/*)."""
