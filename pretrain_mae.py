#!/usr/bin/env python
"""Repo-root shim for `python pretrain_mae.py ...` — the packaged CLI lives
at vitrs_tpu/cli/pretrain_mae.py (console script: `vitrs-pretrain-mae`)."""

from vitrs_tpu.cli.pretrain_mae import main

if __name__ == "__main__":
    main()
