"""Model zoo: the SRCNN 9-1-5 family."""

from . import srcnn  # noqa: F401
