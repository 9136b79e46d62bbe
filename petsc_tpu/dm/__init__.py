from .dm import DM
from .da import DMDA
