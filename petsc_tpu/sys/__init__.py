from .error import Error
from . import viewer  # noqa: F401
from .hdf5 import ViewerHDF5
from .info import info, info_enabled
from .random import Random
from .bag import Bag
from . import draw  # noqa: F401
from .pf import PF
