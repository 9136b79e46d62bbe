from .pc import PC, PCSide
from . import factor_pc  # noqa: F401 — registers ilu/lu/bjacobi impls
from . import mg  # noqa: F401 — registers mg
from . import gamg  # noqa: F401 — registers gamg
from . import more_pc  # noqa: F401 — registers sor/asm/composite/ksp/fieldsplit
from . import extras_pc  # noqa: F401 — eisenstat/kaczmarz/deflation/galerkin/mat/vpbjacobi/redundant
from . import bddc  # noqa: F401 — registers bddc (MATIS)
from . import r3_pc  # noqa: F401 — registers qr/spai/nn
