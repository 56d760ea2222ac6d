from . import losses, distributions, toy, utils  # noqa: F401
