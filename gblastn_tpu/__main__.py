"""Module entry point: ``python -m gblastn_tpu <command> ...``."""
import sys

from gblastn_tpu.cli.main import main

sys.exit(main())
