"""CLI entry point: ``python -m floorist_spark`` (the reference ships a
``floorist`` console script, `/root/reference/pyproject.toml:19`; the
``floorist-spark`` script in this repo's pyproject.toml is the same
surface)."""

from floorist_spark.runner import main

if __name__ == "__main__":
    main()
