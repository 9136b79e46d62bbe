"""PetscRandom: seeded parallel RNG (reference src/sys/classes/random —
rander48/curand impls). TPU-native form wraps jax.random with the
PetscRandom API (interval, seed, per-call streams)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .object import PObject


class Random(PObject):
    _class_name = "PetscRandom"

    def __init__(self, comm=None, seed=0x12345678, **kw):
        super().__init__(**kw)
        self.comm = comm
        self._seed = seed
        self._key = jax.random.PRNGKey(seed)
        self._lo, self._hi = 0.0, 1.0

    @classmethod
    def create(cls, comm=None):
        return cls(comm)

    def setSeed(self, seed):
        self._seed = int(seed)
        return self

    def seed(self):
        self._key = jax.random.PRNGKey(self._seed)
        return self

    def setInterval(self, interval):
        self._lo, self._hi = float(interval[0]), float(interval[1])
        return self

    def getInterval(self):
        return (self._lo, self._hi)

    def getValue(self):
        self._key, sub = jax.random.split(self._key)
        from .. import config
        v = jax.random.uniform(sub, (), dtype=config.real_dtype())
        return float(self._lo + (self._hi - self._lo) * v)

    def getValues(self, n):
        self._key, sub = jax.random.split(self._key)
        from .. import config
        v = jax.random.uniform(sub, (int(n),), dtype=config.real_dtype())
        return self._lo + (self._hi - self._lo) * v
