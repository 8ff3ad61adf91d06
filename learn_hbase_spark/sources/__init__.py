from . import csv_sink, jdbc  # noqa: F401
