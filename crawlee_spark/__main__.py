"""``python -m crawlee_spark`` — the CLI entry point (packages/cli)."""

import sys

from crawlee_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
