from .snes import SNES, snes_reason_string
from .linesearch import LineSearch
