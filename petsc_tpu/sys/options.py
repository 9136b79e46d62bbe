"""Runtime options database.

This is the UX backbone of the framework, replicating PETSc's options
database semantics (reference: src/sys/objects/options.c — PetscOptionsInsert
:852, PetscOptionsSetValue :1294, PetscOptionsGetInt :2722): string-keyed
options with arbitrarily-nested per-object prefixes
(e.g. ``-mg_coarse_telescope_mg_levels_ksp_type richardson``), argv/env/file
sources with argv taking precedence, typed getters, used/unused tracking for
``-options_left``, and bare flags meaning True.

Keys are stored WITHOUT the leading dash. Prefixes compose by plain string
concatenation, exactly like PETSc.
"""

from __future__ import annotations

import re


def _looks_like_number(tok: str) -> bool:
    try:
        float(tok)
        return True
    except ValueError:
        return False


_TRUE = {"true", "yes", "1", "on"}
_FALSE = {"false", "no", "0", "off"}


class Options:
    def __init__(self):
        self._store: dict[str, str | None] = {}
        self._used: set[str] = set()
        # registered help text: (full option name, help string)
        self._help: list[tuple[str, str]] = []

    # ---------------- insertion sources ----------------

    def set_value(self, name: str, value=None):
        name = name.lstrip("-")
        if value is None:
            self._store[name] = None
        elif isinstance(value, bool):
            self._store[name] = "true" if value else "false"
        else:
            self._store[name] = str(value)

    def delete_value(self, name: str):
        self._store.pop(name.lstrip("-"), None)

    def insert_args(self, args: list[str]):
        """Parse an argv-style token list: ``-key [value]`` pairs.

        A token starting with '-' begins a new option unless it parses as a
        number (so ``-ksp_rtol -1e-8`` works, like PETSc's parser).
        """
        i = 0
        while i < len(args):
            tok = args[i]
            if not (tok.startswith("-") and not _looks_like_number(tok)):
                i += 1
                continue  # stray value; ignore like PETSc
            key = tok.lstrip("-")
            val = None
            if i + 1 < len(args):
                nxt = args[i + 1]
                if not nxt.startswith("-") or _looks_like_number(nxt):
                    val = nxt
                    i += 1
            self.set_value(key, val)
            i += 1

    def insert_string(self, s: str):
        self.insert_args(s.split())

    def insert_file(self, path: str):
        """PETSc options-file format: one option per line, # comments."""
        with open(path) as f:
            toks = []
            for line in f:
                line = line.split("#", 1)[0].split("!", 1)[0].strip()
                if line:
                    toks.extend(line.split())
        self.insert_args(toks)

    def insert_yaml(self, path: str):
        """Minimal YAML options support (flat key: value maps, nesting by
        indentation composing prefixes) — reference optionsyaml.c."""
        stack: list[tuple[int, str]] = []
        with open(path) as f:
            for raw in f:
                line = raw.rstrip()
                if not line.strip() or line.strip().startswith("#"):
                    continue
                indent = len(line) - len(line.lstrip())
                key, _, val = line.strip().partition(":")
                val = val.strip()
                while stack and stack[-1][0] >= indent:
                    stack.pop()
                prefix = "".join(p for _, p in stack)
                if val == "":
                    stack.append((indent, key.strip() + "_"))
                else:
                    self.set_value(prefix + key.strip(), val)

    # ---------------- queries ----------------

    def has_name(self, name: str, prefix: str = "") -> bool:
        return (prefix + name.lstrip("-")) in self._store

    def _queried_record(self, full):
        self._queried = getattr(self, "_queried", set())
        self._queried.add(full)

    def _raw(self, name: str, prefix: str = ""):
        key = prefix + name.lstrip("-")
        self._queried_record(key)
        if key in self._store:
            self._used.add(key)
            return True, self._store[key]
        return False, None

    def get_string(self, name, prefix="", default=None):
        found, v = self._raw(name, prefix)
        return v if found else default

    def get_int(self, name, prefix="", default=None):
        found, v = self._raw(name, prefix)
        if not found or v is None:
            return default
        return int(v)

    def get_real(self, name, prefix="", default=None):
        found, v = self._raw(name, prefix)
        if not found or v is None:
            return default
        return float(v)

    def get_bool(self, name, prefix="", default=None):
        found, v = self._raw(name, prefix)
        if not found:
            return default
        if v is None:
            return True  # bare flag
        lv = v.lower()
        if lv in _TRUE:
            return True
        if lv in _FALSE:
            return False
        raise ValueError(f"Option -{prefix}{name}: cannot parse '{v}' as bool")

    def get_int_list(self, name, prefix="", default=None):
        found, v = self._raw(name, prefix)
        if not found or v is None:
            return default
        return [int(x) for x in re.split(r"[,\s]+", v.strip()) if x]

    def get_real_list(self, name, prefix="", default=None):
        found, v = self._raw(name, prefix)
        if not found or v is None:
            return default
        return [float(x) for x in re.split(r"[,\s]+", v.strip()) if x]

    # ---------------- hygiene / introspection ----------------

    def register_help(self, name: str, text: str):
        self._help.append((name, text))

    def print_help(self):
        """-help output: registered help lines plus every option name the
        program has queried so far (PetscOptionsBegin/-help role)."""
        print("Options Database (queried by this program):")
        for name, text in sorted(self._help):
            print(f"  -{name:<40} {text}")
        for full in sorted(getattr(self, "_queried", set())):
            print(f"  -{full}")

    def unused(self):
        """Options set but never queried (-options_left)."""
        return sorted((k, v) for k, v in self._store.items() if k not in self._used)

    def used(self):
        return sorted(self._used)

    def all(self):
        return dict(self._store)

    def view(self):
        lines = ["#PETSc-TPU Option Table entries:"]
        for k, v in sorted(self._store.items()):
            lines.append(f"-{k}" + (f" {v}" if v is not None else ""))
        lines.append("#End of PETSc-TPU Option Table entries")
        return "\n".join(lines)

    def clear(self):
        self._store.clear()
        self._used.clear()

    def prefixed(self, prefix: str) -> "PrefixedOptions":
        return PrefixedOptions(self, prefix)


class PrefixedOptions:
    """A view of an Options database under a fixed prefix (per-object)."""

    def __init__(self, db: Options, prefix: str):
        self.db = db
        self.prefix = prefix or ""

    def __getattr__(self, item):
        fn = getattr(self.db, item)

        def wrap(name, *a, **kw):
            kw.setdefault("prefix", self.prefix)
            return fn(name, *a, **kw)

        if item.startswith(("get_", "has_")):
            return wrap
        return fn
