from . import dedup, filters, joins, similarity, window  # noqa: F401
