from .ksp import KSP, register_ksp
