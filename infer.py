#!/usr/bin/env python
"""Repo-root shim for `python infer.py ...` — the packaged CLI lives at
vitrs_tpu/cli/infer.py (console script: `vitrs-infer`)."""

from vitrs_tpu.cli.infer import main

if __name__ == "__main__":
    main()
