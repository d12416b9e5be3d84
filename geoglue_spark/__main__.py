"""``python -m geoglue_spark`` — the CLI entry point (see cli.py)."""

import sys

from .cli import main

sys.exit(main())
