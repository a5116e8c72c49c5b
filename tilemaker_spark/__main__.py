"""python -m tilemaker_spark — the reference-parity CLI (see cli.py)."""

from tilemaker_spark.cli import main

main()
