#!/usr/bin/env python
"""Thin wrapper: inference CLI (parity with the reference's infer.py)."""
from selfreconcode_tpu.cli.infer import main

if __name__ == "__main__":
    main()
