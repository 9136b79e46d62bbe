"""PetscInfo: -info verbose runtime introspection per class
(reference src/sys/info/verboseinfo.c)."""

from __future__ import annotations


def info_enabled(cls_name: str | None = None) -> bool:
    from .. import config
    st = config.state()
    flag = st.options.get_string("info", default=None)
    if flag is None and not st.options.has_name("info"):
        return False
    if flag in (None, "", "true"):
        return True
    # -info <classlist> filters by class name(s)
    if cls_name is None:
        return True
    return cls_name.lower() in {c.strip().lower() for c in flag.split(",")}


def info(obj, msg: str):
    """PetscInfo(obj, ...) analog: print when -info is active (optionally
    filtered by class list: -info KSP,PC)."""
    cls = getattr(obj, "_class_name", None) or type(obj).__name__
    if info_enabled(cls):
        print(f"[0] {cls} {msg}")
