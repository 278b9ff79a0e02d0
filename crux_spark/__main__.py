"""python -m crux_spark — the reference's crux.main entry point."""

from crux_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
