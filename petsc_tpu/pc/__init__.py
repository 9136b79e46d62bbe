from .pc import PC, PCSide
from . import factor_pc  # noqa: F401 — registers ilu/lu/bjacobi impls
