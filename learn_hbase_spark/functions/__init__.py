from . import scalar, text  # noqa: F401
