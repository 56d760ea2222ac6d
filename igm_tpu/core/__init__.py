from . import state, modules, optim, logging  # noqa: F401
