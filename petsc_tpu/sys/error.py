"""Error handling and typed solver-outcome reasons.

PETSc's error macros (PetscCall/SETERRQ/PetscCheck, reference
include/petscerror.h:55,191,554) become Python exceptions; its *graceful
numerical failure* design — every solver sets a typed ConvergedReason rather
than erroring (reference src/ksp/ksp/interface/iterativ.c:1519) — is kept
verbatim, since it is load-bearing for nested solvers (inner failures
propagate as reasons, e.g. SNES_DIVERGED_INNER).

Reason integer values match the reference enums (include/petscksp.h:817,
include/petscsnes.h, include/petscts.h) so users can switch frameworks
without re-learning codes.
"""

from __future__ import annotations

from enum import IntEnum


class Error(Exception):
    """Base error (SETERRQ analog)."""


class NotConvergedError(Error):
    """Raised when *_error_if_not_converged is set."""


def check(cond, msg="error"):
    """PetscCheck analog: raise on host-side invariant violation."""
    if not cond:
        raise Error(msg)


class KSPConvergedReason(IntEnum):
    # include/petscksp.h:817-846
    CONVERGED_RTOL_NORMAL_EQUATIONS = 1
    CONVERGED_RTOL = 2
    CONVERGED_ATOL = 3
    CONVERGED_ITS = 4
    CONVERGED_NEG_CURVE = 5
    CONVERGED_STEP_LENGTH = 6
    CONVERGED_HAPPY_BREAKDOWN = 7
    CONVERGED_USER = 8
    CONVERGED_ATOL_NORMAL_EQUATIONS = 9
    ITERATING = 0
    DIVERGED_NULL = -2
    DIVERGED_ITS = -3
    DIVERGED_DTOL = -4
    DIVERGED_BREAKDOWN = -5
    DIVERGED_BREAKDOWN_BICG = -6
    DIVERGED_NONSYMMETRIC = -7
    DIVERGED_INDEFINITE_PC = -8
    DIVERGED_NANORINF = -9
    DIVERGED_INDEFINITE_MAT = -10
    DIVERGED_PC_FAILED = -11
    DIVERGED_USER = -12

    @property
    def converged(self):
        return self.value > 0

    @property
    def diverged(self):
        return self.value < 0


class SNESConvergedReason(IntEnum):
    # include/petscsnes.h SNESConvergedReason
    CONVERGED_FNORM_ABS = 2
    CONVERGED_FNORM_RELATIVE = 3
    CONVERGED_SNORM_RELATIVE = 4
    CONVERGED_ITS = 5
    CONVERGED_USER = 6
    ITERATING = 0
    DIVERGED_FUNCTION_DOMAIN = -1
    DIVERGED_FUNCTION_COUNT = -2
    DIVERGED_LINEAR_SOLVE = -3
    DIVERGED_FNORM_NAN = -4
    DIVERGED_MAX_IT = -5
    DIVERGED_LINE_SEARCH = -6
    DIVERGED_INNER = -7
    DIVERGED_LOCAL_MIN = -8
    DIVERGED_DTOL = -9
    DIVERGED_JACOBIAN_DOMAIN = -10
    DIVERGED_TR_DELTA = -11
    DIVERGED_USER = -12

    @property
    def converged(self):
        return self.value > 0

    @property
    def diverged(self):
        return self.value < 0


class TSConvergedReason(IntEnum):
    CONVERGED_ITERATING = 0
    CONVERGED_TIME = 1
    CONVERGED_ITS = 2
    CONVERGED_USER = 3
    CONVERGED_EVENT = 4
    DIVERGED_NONLINEAR_SOLVE = -1
    DIVERGED_STEP_REJECTED = -2

    @property
    def converged(self):
        return self.value > 0


class TaoConvergedReason(IntEnum):
    CONVERGED_GATOL = 3
    CONVERGED_GRTOL = 4
    CONVERGED_GTTOL = 5
    CONVERGED_STEPTOL = 6
    CONVERGED_MINF = 7
    CONVERGED_USER = 8
    CONTINUE_ITERATING = 0
    DIVERGED_MAXITS = -2
    DIVERGED_NAN = -4
    DIVERGED_MAXFCN = -5
    DIVERGED_LS_FAILURE = -6
    DIVERGED_TR_REDUCTION = -7
    DIVERGED_USER = -8

    @property
    def converged(self):
        return self.value > 0


class PCFailedReason(IntEnum):
    SETUP_ERROR = -1
    NOERROR = 0
    FACTOR_STRUCT_ZEROPIVOT = 1
    FACTOR_NUMERIC_ZEROPIVOT = 2
    FACTOR_OUTMEMORY = 3
    FACTOR_OTHER = 4
    SUBPC_ERROR = 5


# PETSc convergence-reason strings as printed by -ksp_converged_reason
_KSP_REASON_STRINGS = {
    KSPConvergedReason.CONVERGED_RTOL: "CONVERGED_RTOL",
    KSPConvergedReason.CONVERGED_ATOL: "CONVERGED_ATOL",
    KSPConvergedReason.CONVERGED_ITS: "CONVERGED_ITS",
    KSPConvergedReason.CONVERGED_HAPPY_BREAKDOWN: "CONVERGED_HAPPY_BREAKDOWN",
    KSPConvergedReason.DIVERGED_ITS: "DIVERGED_ITS",
    KSPConvergedReason.DIVERGED_DTOL: "DIVERGED_DTOL",
    KSPConvergedReason.DIVERGED_BREAKDOWN: "DIVERGED_BREAKDOWN",
    KSPConvergedReason.DIVERGED_BREAKDOWN_BICG: "DIVERGED_BREAKDOWN_BICG",
    KSPConvergedReason.DIVERGED_INDEFINITE_PC: "DIVERGED_INDEFINITE_PC",
    KSPConvergedReason.DIVERGED_NANORINF: "DIVERGED_NANORINF",
    KSPConvergedReason.DIVERGED_PC_FAILED: "DIVERGED_PC_FAILED",
    KSPConvergedReason.DIVERGED_NULL: "DIVERGED_NULL",
}


def ksp_reason_string(reason) -> str:
    r = KSPConvergedReason(int(reason))
    return _KSP_REASON_STRINGS.get(r, r.name)
