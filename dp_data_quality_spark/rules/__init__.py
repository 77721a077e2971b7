from . import contract, regexes  # noqa: F401
