#!/usr/bin/env python
"""Repo-root shim for `python train.py ...` — the packaged CLI lives at
vitrs_tpu/cli/train.py (console script: `vitrs-train`)."""

from vitrs_tpu.cli.train import main

if __name__ == "__main__":
    main()
