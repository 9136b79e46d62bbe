"""Expected-output test harness.

Replicates the reference's test mechanism (SURVEY.md §4; config/testparse.py,
petsc_harness.sh): example programs run with an args string and their stdout
is diffed against checked-in expected output, with numeric-tolerant
comparison standing in for the reference's sed `filter:` slack.
"""

from __future__ import annotations

import contextlib
import io
import re

_NUM = re.compile(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?")


def run_example(main_fn, args: str | list, **kw):
    """Run an example's main() capturing stdout; returns the text. Extra
    kwargs (e.g. comm= for an nsize>1 run) pass through to main()."""
    import petsc_tpu as pt
    pt.config.state().options.clear()
    if isinstance(args, str):
        args = args.split()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main_fn(list(args), **kw)
    return buf.getvalue()


def diff_output(actual: str, expected: str, rtol=1e-4, atol=1e-10):
    """Line-by-line compare; numbers fuzzy within rtol, text exact.
    Returns list of mismatch descriptions (empty = pass)."""
    problems = []
    alines = [l.rstrip() for l in actual.strip().splitlines()]
    elines = [l.rstrip() for l in expected.strip().splitlines()]
    if len(alines) != len(elines):
        problems.append(f"line count {len(alines)} != expected {len(elines)}")
    for i, (a, e) in enumerate(zip(alines, elines)):
        if a == e:
            continue
        anums = _NUM.findall(a)
        enums = _NUM.findall(e)
        askel = _NUM.sub("#", a)
        eskel = _NUM.sub("#", e)
        if askel != eskel or len(anums) != len(enums):
            problems.append(f"line {i}: '{a}' != '{e}'")
            continue
        for x, y in zip(anums, enums):
            fx, fy = float(x), float(y)
            if abs(fx - fy) > atol + rtol * abs(fy):
                problems.append(f"line {i}: number {fx} != {fy} "
                                f"(rtol {rtol}): '{a}' vs '{e}'")
                break
    return problems


def assert_output(actual: str, expected: str, rtol=1e-4, atol=1e-10):
    problems = diff_output(actual, expected, rtol, atol)
    assert not problems, "output mismatch:\n" + "\n".join(problems) \
        + "\n--- actual ---\n" + actual
