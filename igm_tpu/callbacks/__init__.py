from . import visualization, evaluation, util  # noqa: F401
