"""PetscObject-equivalent base class.

Reference: struct _p_PetscObject (include/petsc/private/petscimpl.h:108) —
classid, refcount, runtime type name, options prefix, composed
functions/objects, and a *state counter* used for cache invalidation (e.g. a
preconditioner refactorizes only when the operator's state changed). Python
garbage collection replaces refcounting; everything else is kept because it
is the framework's plumbing: the Create → SetType/SetFromOptions → SetUp →
Apply → View → Destroy lifecycle with runtime-selectable types from a
per-class registry.
"""

from __future__ import annotations

from .. import config
from .logging import info


class PObject:
    _type_registry: dict  # per-subclass: type name -> factory/impl class
    _class_name = "PObject"
    _default_type: str | None = None

    def __init__(self, options=None, prefix=""):
        self._options = options if options is not None else config.options()
        self._prefix = prefix or ""
        self._type: str | None = None
        self._name = ""
        self._state = 0          # bumped on data changes; caches key off it
        self._composed = {}      # PetscObjectCompose analog
        self._setup_called = False
        self._setup_state = -1   # object state at last setup (reuse logic)

    # ---------------- lifecycle ----------------

    def increase_state(self):
        self._state += 1

    @property
    def state(self):
        return self._state

    def set_options_prefix(self, prefix: str):
        self._prefix = prefix or ""

    def append_options_prefix(self, prefix: str):
        self._prefix = self._prefix + (prefix or "")

    def get_options_prefix(self):
        return self._prefix

    @property
    def options(self):
        return self._options

    def opt(self, getter: str, name: str, default=None):
        """Prefixed option lookup: obj.opt('get_int', 'ksp_max_it', 30)."""
        return getattr(self._options, getter)(name, prefix=self._prefix, default=default)

    def set_name(self, name):
        self._name = name

    def get_name(self):
        return self._name

    def compose(self, key, obj):
        self._composed[key] = obj

    def query(self, key):
        return self._composed.get(key)

    # ---------------- runtime type selection ----------------

    @classmethod
    def register(cls, name: str, impl):
        if "_type_registry" not in cls.__dict__:
            cls._type_registry = {}
        cls._type_registry[name] = impl

    @classmethod
    def registered_types(cls):
        return sorted(cls.__dict__.get("_type_registry", {}))

    def set_type(self, name: str):
        reg = type(self).__dict__.get("_type_registry", {})
        if name not in reg:
            raise KeyError(
                f"Unknown {self._class_name} type '{name}'. "
                f"Registered: {', '.join(sorted(reg))}")
        if self._type == name:
            return
        self._type = name
        self._setup_called = False
        self._impl_changed(reg[name])

    def get_type(self):
        return self._type

    def _impl_changed(self, impl):
        """Subclass hook: install implementation object/functions."""
        raise NotImplementedError

    def set_from_options(self):
        """Subclass hook: read options DB under this object's prefix."""

    def setup(self):
        self._setup_called = True

    def view(self, viewer=None):
        print(f"{self._class_name} Object: ({self._prefix}) type: {self._type}")

    def destroy(self):
        self._composed.clear()

    def log_info(self, msg):
        info(self, msg)
