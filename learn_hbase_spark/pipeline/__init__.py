from . import fixtures, rdl  # noqa: F401
