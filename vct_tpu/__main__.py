"""`python -m vct_tpu ...` — see vct_tpu/cli.py."""

from vct_tpu.cli import main

main()
