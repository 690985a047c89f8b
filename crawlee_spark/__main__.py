"""``python -m crawlee_spark`` — the CLI entry point (packages/cli)."""

import sys

from crawlee_spark.cli import main

sys.exit(main())
