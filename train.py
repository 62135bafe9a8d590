#!/usr/bin/env python
"""Thin wrapper: per-subject training CLI (parity with the reference's
train.py invocation style)."""
from selfreconcode_tpu.cli.train import main

if __name__ == "__main__":
    main()
